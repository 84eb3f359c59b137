package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key aggregations and joins.
  *
  * At 100 TB a handful of hot keys (a boilerplate document hash, a default
  * locality) can pin one reducer while the rest of the cluster idles. Two
  * standard remedies, both pure DataFrame programs:
  *
  *  - salted two-stage aggregation: spread each key over `salts` partial
  *    groups, aggregate, then combine. Exact for decomposable aggregates
  *    (sum/count/min/max) — the partial-combine identity Catalyst already
  *    uses map-side, applied one level deeper.
  *  - salted broadcast-replicated join: explode the small side `salts`
  *    ways so a skewed big-side key hashes across `salts` reducers.
  *
  * (AQE's runtime skew-join splitting handles the shuffle-join case
  * automatically; these are for the aggregation path and for forcing a
  * deterministic layout without AQE.)
  */
object Skew {

  /** Exact count per key via salted two-stage aggregation. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted.groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("n"))
  }

  /** Exact salted sum of `valueCol` per key (decomposable combine). */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valueCol: Column,
                salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .withColumn("_v", valueCol)
    salted.groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(sum(col("_v")).as("_partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_partial")).as("total"))
  }

  /** Salted equi-join: replicate the (small) right side `salts` times and
    * give each left row a random-but-deterministic salt, so one hot left
    * key spreads over `salts` shuffle partitions. Exact join result. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }
}
