package graft

import java.nio.file.Files

/** Round-15 pins for q_qc_ind_audit: a hand-built mini-schema where one
  * edge holds, one has exactly two orphan keys, and NULL dep values are
  * excluded from the distinct count by contract. */
class IndAuditSpec extends SparkSpecBase {

  test("orphan counting, NULL exclusion, and the holds flag by hand") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ind").toString
    // orders 1..4; lineitem references 1,2,2,7,9 (+ a NULL row):
    // forward edge lineitem→orders misses {7,9}; reverse edge
    // orders→lineitem misses {3,4}.
    Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Some(1L), Some(2L), Some(2L), Some(7L), Some(9L), None)
      .toDF("l_orderkey")
      .withColumn("l_partkey", org.apache.spark.sql.functions.lit(4L))
      .withColumn("l_suppkey", org.apache.spark.sql.functions.lit(5L))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((4L, "p")).toDF("p_partkey", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((5L, 0L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq((10L, 0L), (20L, 0L), (30L, 0L), (40L, 0L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, 0L)).toDF("n_nationkey", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq(Tuple1(0L)).toDF("r_regionkey")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")

    val got = SparkEntry.queries("q_qc_ind_audit")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val fwd = got("lineitem.l_orderkey")
    assert(fwd._1 == 4L, "NULL excluded: distinct deps are {1,2,7,9}")
    assert(fwd._2 == 2L, "orphans {7,9}")
    assert(!fwd._3)
    val rev = got("orders.o_orderkey")
    assert(rev == ((4L, 2L, false)), "reverse edge misses orders {3,4}")
    val part = got("lineitem.l_partkey")
    assert(part == ((1L, 0L, true)))
    val nat = got("customer.c_nationkey")
    assert(nat == ((1L, 0L, true)))
  }
}
