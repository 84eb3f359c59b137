package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Pins for the Q15-shaped top-supplier query: the exact
  * cent-hundredths revenue kernel, the quarter window bounds, and the
  * every-tie-kept contract of the scalar-max filter. */
class TopSupplierSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  test("max ties all returned, out-of-window revenue excluded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q15").toString
    Seq((1L, "Supplier#1"), (2L, "Supplier#2"), (3L, "Supplier#3"))
      .toDF("s_suppkey", "s_name").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // rev_c2 = floor(price*100+0.5) * (100 - floor(disc*100+0.5)):
    //  s1 in-window: 1000*90 + 500*100 = 140000; one huge row on the
    //  window's exclusive upper bound must NOT count;
    //  s2 in-window: 1400*100 = 140000 (exact tie);
    //  s3 in-window: 139900 (loses by one cent-hundredth).
    Seq(
      (1L, ts("1997-01-15"), 10.00, 0.10),
      (1L, ts("1997-03-31"), 5.00, 0.00),
      (1L, ts("1997-04-01"), 999.99, 0.00),
      (2L, ts("1997-02-01"), 14.00, 0.00),
      (3L, ts("1997-02-01"), 13.99, 0.00))
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_sql_top_supplier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((1L, "Supplier#1", 140000L),
      (2L, "Supplier#2", 140000L)))
  }

  test("single winner when no tie; inclusive lower window bound counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-q15b").toString
    Seq((7L, "Supplier#7"), (8L, "Supplier#8"))
      .toDF("s_suppkey", "s_name").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    Seq(
      (7L, ts("1997-01-01"), 1.00, 0.00), // on the inclusive lower bound
      (8L, ts("1997-02-01"), 0.99, 0.00))
      .toDF("l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_sql_top_supplier")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((7L, "Supplier#7", 10000L)))
  }
}
