package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 build (Kimball's dimensional-modeling
  * workhorse): collapse a change event stream into effective-dated
  * dimension rows — one row per (key, value-run) with [valid_from,
  * valid_to) interval, a version ordinal, and an is_current flag.
  *
  * Shape at scale: everything is ONE shuffle (hash by the dimension key)
  * followed by in-partition sorted windows — lag to drop no-op changes,
  * lead to close each run. No self-join against history, so rebuilding a
  * 100 TB dimension is a single pass; incremental refresh composes with
  * [[graft.store.IncrementalAgg]]-style state (append new changes, re-run
  * over the touched keys only).
  *
  * Determinism: ties within a key at the same timestamp are ordered by
  * the change id, so the surviving run-boundaries are unique however the
  * input is partitioned. */
object Scd2 {

  /** changes(keyCol, tsCol, idCol, valueCol) → SCD2 dimension rows:
    * (key, value, valid_from, valid_to, version_n, is_current).
    * valid_to is NULL on the open (current) row. */
  def build(changes: DataFrame, keyCol: String, tsCol: String,
            idCol: String, valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    // Drop consecutive no-op changes: a row opens a run only when its
    // value differs from the previous change's value (first change always
    // opens).
    val opens = changes
      .withColumn("_prev", lag(col(valueCol), 1).over(byKey))
      .filter(col("_prev").isNull || !(col("_prev") <=> col(valueCol)))
    val runs = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    opens
      .withColumn("valid_to", lead(col(tsCol), 1).over(runs))
      .withColumn("version_n", row_number().over(runs).cast("long"))
      .select(col(keyCol), col(valueCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("version_n"), col("valid_to").isNull.as("is_current"))
  }
}
