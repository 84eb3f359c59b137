package graft

import java.nio.file.Files

/** Wave-17 pins: k-anonymity / l-diversity audit on a constructed
  * customer+orders universe with hand-known equivalence classes. */
class KAnonymitySpec extends SparkSpecBase {

  private def dirWith(cust: Seq[(Long, Int, String, Double)],
                      ords: Seq[(Long, Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kanon").toString
    cust.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    ords.zipWithIndex.map { case ((ck, _, pr), i) => (i.toLong, ck, pr) }
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    dir
  }

  test("hand universe: class sizes, risk mass, and l-diversity match") {
    // Class A (nat 1, SEG1, band of 500.0): customers 1-5 → k=5 (safe).
    // Class B (nat 1, SEG1, band of 4100.0): customers 6-7 → k=2 (<5).
    // Class C (nat 2, SEG2, band of 500.0): customer 8 → k=1 (<5).
    val cust =
      (1L to 5L).map(k => (k, 1, "SEG1", 500.0)) ++
      Seq((6L, 1, "SEG1", 4100.0), (7L, 1, "SEG1", 4100.0),
        (8L, 2, "SEG2", 500.0))
    // Orders: class A sees two priorities (l=2); class B only '1-URGENT'
    // (l=1, homogeneity attack); class C has NO orders (excluded from l).
    val ords = Seq((1L, 0L, "1-URGENT"), (2L, 0L, "2-HIGH"),
      (6L, 0L, "1-URGENT"), (7L, 0L, "1-URGENT"))
    val r = SparkEntry.queries("q_gov_k_anonymity")(
      spark, dirWith(cust, ords)).collect().head
    assert(r.getLong(0) == 8L, "n_rows")
    assert(r.getLong(1) == 3L, "n_classes")
    assert(r.getLong(2) == 1L, "k_anon = worst class")
    assert(r.getLong(3) == 2L, "classes below k=5")
    assert(r.getLong(4) == 3L, "rows at risk: 2 + 1")
    assert(r.getLong(5) == 3750L, "risk_bp = 3*1e4 div 8")
    assert(r.getLong(6) == 2L, "classes with orders")
    assert(r.getLong(7) == 1L, "min_l: class B is single-valued")
    assert(r.getLong(8) == 1L, "exactly one homogeneous class")
  }

  test("negative balances band without engine divergence (shifted division)") {
    // -999.99 → cents -99999 → +100000 = 1 → band 0; 999.99 → band 0;
    // 3000.0 → 400000 div 200000 = band 2 — all classes well-defined.
    val cust = Seq((1L, 1, "S", -999.99), (2L, 1, "S", 999.99),
      (3L, 1, "S", 3000.0))
    val ords = Seq((1L, 0L, "1-URGENT"))
    val r = SparkEntry.queries("q_gov_k_anonymity")(
      spark, dirWith(cust, ords)).collect().head
    assert(r.getLong(1) == 2L, "bands 0 (two rows) and 2 (one row)")
    assert(r.getLong(2) == 1L)
  }
}
