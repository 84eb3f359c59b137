package graft

import org.apache.spark.sql.functions._

import graft.operators.HllSketch

/** Relational HLL: bounded register file, the elementwise-max union law,
  * and estimate accuracy within the m=256 error envelope. */
class HllSketchSpec extends SparkSpecBase {

  test("register file is bounded by m rows per group") {
    import spark.implicits._
    val df = (1 to 50000).map(i => ("g", i.toLong)).toDF("grp", "item")
    val regs = HllSketch.registers(df, "grp", "item")
    assert(regs.count() <= 256)
  }

  test("union law: merged registers == registers of the concatenated data") {
    import spark.implicits._
    val a = (1 to 3000).map(i => ("a", i.toLong)).toDF("grp", "item")
    val b = (2000 to 6000).map(i => ("b", i.toLong)).toDF("grp", "item")
    val perGroup = HllSketch.registers(a.unionAll(b), "grp", "item")
    val merged = HllSketch.merged(perGroup, "u")
      .select("reg", "rho").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = HllSketch.registers(
        a.unionAll(b).withColumn("grp", lit("u")), "grp", "item")
      .select("reg", "rho").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct)
  }

  test("estimate lands within 3 rsd of the exact distinct count") {
    import spark.implicits._
    for (n <- Seq(500, 5000, 40000)) {
      val df = (1 to n).map(i => ("g", s"item-$i")).toDF("grp", "item")
      val est = HllSketch.estimate(HllSketch.registers(df, "grp", "item"))
        .head.getAs[Long]("hll_estimate")
      val rsd = 1.04 / math.sqrt(256)
      assert(math.abs(est - n) <= 3 * rsd * n + 16,
        s"n=$n est=$est outside 3 rsd")
    }
  }

  test("duplicates do not move the registers") {
    import spark.implicits._
    val once = (1 to 1000).map(i => ("g", i.toLong)).toDF("grp", "item")
    val thrice = once.unionAll(once).unionAll(once)
    val r1 = HllSketch.registers(once, "grp", "item").collect().toSet
    val r3 = HllSketch.registers(thrice, "grp", "item").collect().toSet
    assert(r1 == r3)
  }
}
