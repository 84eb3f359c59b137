package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Incremental JOIN maintenance (insert-only deltas — the join case of
  * Gupta & Mumick's view-maintenance algebra, and the core of every
  * streaming/lakehouse "incremental model" that materializes A ⋈ B):
  * when delta batches ΔA and ΔB append to A and B, the materialized join
  * grows by exactly
  *
  *   ΔJ = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *       = (ΔA ⋈ B) ∪ ((A ∪ ΔA) ⋈ ΔB)
  *
  * (the second form avoids double-counting the ΔA ⋈ ΔB corner by joining
  * ΔB against the POST-delta left side). History J is never rescanned or
  * re-joined.
  *
  * Why it matters at 100 TB: refreshing a materialized fact-to-fact join
  * costs two delta-sized joins instead of one |A|×|B|-sized re-join; each
  * delta side is typically small enough to BROADCAST against the big
  * stored relation, so the refresh often runs with zero shuffles of
  * history. The correctness contract — J ∪ ΔJ == (A ∪ ΔA) ⋈ (B ∪ ΔB) —
  * is what the registry query hash-checks against the oracle's one-shot
  * join. */
object IncrementalJoin {

  /** The delta rows to append to the materialized join when `dA` appends
    * to `aOld` and `dB` appends to `bOld`. Delta sides broadcast (the
    * refresh assumption: |Δ| ≪ |state|); pass the post-delta left side
    * pre-unioned if it is already materialized. */
  def deltaJoin(aOld: DataFrame, bOld: DataFrame,
                dA: DataFrame, dB: DataFrame,
                keys: Seq[String]): DataFrame = {
    val aNew = aOld.unionByName(dA)
    broadcast(dA).join(bOld, keys)
      .unionByName(aNew.join(broadcast(dB), keys))
  }
}
