package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance (insert-only delta
  * refresh — the self-maintainable-view case of Gupta & Mumick's view
  * maintenance survey, and what every lakehouse "incremental model"
  * compiles to): keep the aggregate STATE as a keyed relation of
  * decomposable partials (count, sum), fold each new delta batch in by
  * aggregating ONLY the delta and merging partials, and never rescan
  * history.
  *
  * Why it matters at 100 TB: the daily refresh of a `GROUP BY` dashboard
  * over an append-only fact table costs O(|delta|), not O(|table|) — the
  * state relation is keys-sized (KBs–MBs), the delta partial-aggregates
  * map-side, and the merge is a shuffle of two keys-sized relations.
  * Count and sum are the canonical decomposable pair; avg/stddev derive
  * from them at read time. (Min/max are insert-only-maintainable too;
  * deletes would need the full re-aggregate path.)
  *
  * The correctness contract — merge(state(hist), partial(delta)) equals
  * the full re-aggregate over hist ∪ delta — is what the registry query
  * hash-checks against the oracle's one-shot GROUP BY. */
object IncrementalAgg {

  /** Keyed partials over one batch: n rows and the exact decimal sum of
    * `sumCol` per key (decimal so merge order never matters). */
  def partial(batch: DataFrame, keys: Seq[String], sumCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(sumCol).cast("decimal(22,6)")).as("s"))

  /** Fold a delta's partials into the state: union + re-aggregate — the
    * state stays one row per key. Both inputs are already keys-sized. */
  def merge(state: DataFrame, deltaPartial: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(deltaPartial)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
}
