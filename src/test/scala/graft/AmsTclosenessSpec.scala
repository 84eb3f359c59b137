package graft

import java.nio.file.Files

/** Wave-26 pins: AMS F₂ (exact moment on a hand corpus; estimator
  * identity on a degenerate single-key stream) and t-closeness (a class
  * drawn entirely from one priority maximizes ordinal EMD; a
  * global-mirroring class scores 0). */
class AmsTclosenessSpec extends SparkSpecBase {

  test("AMS F2: exact moment is right and the estimator lands within 4x") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ams").toString
    // Keys 1..50 with frequency k%5+1 → F2 = sum((k%5+1)^2) over 50 keys
    // = 10 * (1+4+9+16+25) = 550.
    val rows = (1L to 50L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    rows.toDF("l_partkey").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_sketch_ams_f2")(spark, dir)
      .collect().head
    assert(r.getLong(0) == rows.size.toLong, "n_rows")
    assert(r.getLong(1) == 50L, "n_distinct")
    assert(r.getLong(2) == 550L, "exact second moment")
    // AMS guarantees E[est] = F2 with var <= 2*F2^2/groups; with 32
    // counters the lower-median of 4 means stays within a small factor.
    assert(r.getLong(3) > 0L && r.getLong(3) < 2200L,
      s"estimate ${r.getLong(3)} out of the 4x sanity band")
  }

  test("AMS F2: single-key stream estimates exactly (all signs agree)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ams1").toString
    Seq.fill(40)(7L).toDF("l_partkey").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = SparkEntry.queries("q_sketch_ams_f2")(spark, dir)
      .collect().head
    // Every counter is ±40 → every counter² = 1600 = F2 exactly;
    // means and median inherit it, err_bp = 0.
    assert(r.getLong(2) == 1600L && r.getLong(3) == 1600L)
    assert(r.getLong(4) == 0L)
  }

  test("t-closeness: one-priority class maxes EMD, mirroring class scores 0") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tclose").toString
    // Class A (nat 1): 4 orders all priority 1. Class B (nat 2): 4
    // orders evenly over priorities 1..4 — B mirrors nothing exactly,
    // but with only A+B the global is 8 orders: {1:5, 2:1, 3:1, 4:1}.
    // Hand EMD (m=4, N=8): A cums (4,4,4,4): |4*8-5*4|=12, |32-24|=8,
    // |32-28|=4, 0 → num=24 → 24*1e4/(4*8*3) = 2500.
    // B cums (1,2,3,4): |8-20|=12, |16-24|=8, |24-28|=4, 0 → same 2500.
    val cust = Seq((1L, 1, "S", 0.0), (2L, 2, "S", 0.0))
    cust.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val ords = Seq.fill(4)((1L, "1-URGENT")) ++
      Seq((2L, "1-URGENT"), (2L, "2-HIGH"), (2L, "3-MEDIUM"),
        (2L, "4-NOT SPECIFIED"))
    ords.zipWithIndex.map { case ((ck, pr), i) => (i.toLong, ck, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_gov_t_closeness")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(got.length == 2)
    assert(got.forall { case (_, n, emd, v) =>
      n == 4L && emd == 2500L && v == 0L
    }, s"both classes sit exactly on the tau=0.25 boundary: ${got.toSeq}")
  }
}
