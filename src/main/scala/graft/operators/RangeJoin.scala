package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: left rows matched to the right intervals
  * containing them. Spark plans a raw `p BETWEEN start AND end` join as a
  * broadcast-nested-loop (every point × every interval) — quadratic and a
  * cluster-killer once the interval side outgrows broadcast.
  *
  * Bucketed formulation: pick a bucket width, explode every interval into
  * the buckets it overlaps, map every point to its one bucket, equi-join on
  * the bucket (hash-partitioned, scalable), then apply the exact BETWEEN as
  * a post-filter. Join cardinality is bounded by points × intervals-per-
  * bucket instead of points × intervals; width tunes the explode factor
  * (≈ interval length / width buckets per interval).
  */
object RangeJoin {

  /** Inner point-in-interval match (an interval that matches nothing simply
    * contributes no rows; outer variants would need the filter folded into
    * the join condition).
    * @param keys optional extra equi-keys the match must also agree on. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(pointCol).cast("double") / bucketWidth).cast("long"))
    val iv = intervals.withColumn("_bucket",
        explode(sequence(
          floor(col(startCol).cast("double") / bucketWidth).cast("long"),
          floor(col(endCol).cast("double") / bucketWidth).cast("long"))))
    p.join(iv, (keys :+ "_bucket").map(k => p(k) === iv(k)).reduce(_ && _))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("_bucket")
  }
}
