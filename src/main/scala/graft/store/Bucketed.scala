package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed managed tables — Spark's answer to "co-locate the join once,
  * join for free forever" (Hive bucketing semantics; SPARK-12394). Landing
  * both sides of a recurring equi-join `bucketBy(n, key)` + `sortBy(key)`
  * pins each key to a deterministic bucket file at WRITE time, so every
  * later join on that key runs exchange-free: the scan itself reports the
  * hash partitioning and sort order, and the sort-merge join consumes the
  * bucket files directly.
  *
  * This is the 100 TB pattern the one-shot `repartition` cannot give: a
  * fact table landed bucketed by its join key amortizes ONE shuffle across
  * every downstream join/aggregation on that key (ETL writes once per day;
  * analysts join hundreds of times). Bucket count is a layout decision —
  * pick it so a bucket ≈ one task's worth of data at the target scale; it
  * must match on both sides for the exchange-free plan (Spark 4 can
  * coalesce mismatched-but-divisible bucket counts).
  */
object Bucketed {

  /** Land `df` as a bucketed + in-bucket-sorted managed parquet table
    * (overwriting any previous layout). The write shuffles by `bucketCol`
    * once; that is the shuffle every subsequent join on `bucketCol`
    * skips. */
  def land(df: DataFrame, table: String, bucketCol: String,
           nBuckets: Int): Unit = {
    val spark = df.sparkSession
    // Idempotent across JVMs: the in-memory catalog forgets the table on
    // restart but its managed location survives on disk, and saveAsTable
    // refuses a location it no longer owns. Drop both.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Read a landed bucketed table (the catalog carries the bucket spec —
    * a plain parquet path read would lose it and re-shuffle). */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
