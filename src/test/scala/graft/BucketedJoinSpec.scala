package graft

import org.apache.spark.sql.functions._

/** Bucketing — the third co-location lever next to broadcast and
  * repartition: two tables bucketed by the join key join with NO
  * exchange on either side, because the bucket layout IS the required
  * partitioning. At 100 TB this is the difference between shuffling two
  * fact tables per join and shuffling them once at write time, amortized
  * over every later join. */
class BucketedJoinSpec extends SparkSpecBase {

  test("bucketed-by-key tables join with zero exchanges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // Force a non-broadcast join so the exchange-free claim is about
      // bucketing, not about one side being tiny.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      (0L until 1000L).map(i => (i % 97, i)).toDF("k", "va")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/a").mode("overwrite").saveAsTable("bk_a")
      (0L until 1000L).map(i => (i % 89, i * 2)).toDF("k", "vb")
        .write.bucketBy(8, "k").sortBy("k")
        .option("path", s"$tmp/b").mode("overwrite").saveAsTable("bk_b")
      val joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"))
      joined.collect() // finalize AQE
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$p")
      // Same rows as the unbucketed plan.
      val expected = (0L until 1000L).map(i => i % 97)
        .flatMap(k => (0L until 1000L).filter(i => i % 89 == k).map(_ => k))
        .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.sql("DROP TABLE IF EXISTS bk_a")
      spark.sql("DROP TABLE IF EXISTS bk_b")
    }
  }
}
