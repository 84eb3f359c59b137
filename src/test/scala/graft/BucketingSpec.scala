package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: when both sides are bucketed by the join key,
  * the sort-merge join needs NO shuffle exchange — the pre-partitioning
  * strategy for repeated large-large joins at 100 TB (pay the shuffle once
  * at write time, never again at read time). */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // (tables land in the session's default spark-warehouse; dropped below)
    // disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      // no shuffle feeding the join: the only allowed exchange is the
      // post-join aggregation one
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$joinSection")

      // and the result matches the unbucketed join
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
