package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpecBase {

  private def grid(n: Int) = {
    import spark.implicits._
    (for { x <- 0 until n; y <- 0 until n } yield (x, y)).toDF("x", "y")
  }

  test("zValue interleaves bits: x even positions, y odd") {
    import spark.implicits._
    val cases = Seq((1, 0, 1L), (0, 1, 2L), (2, 1, 6L), (3, 3, 15L),
      (0, 0, 0L), (15, 0, 85L)) // 15 -> bits 0..3 -> even slots 0,2,4,6
    val out = cases.map(c => (c._1, c._2)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 4).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == cases.map(_._3))
  }

  test("z-order layout keeps BOTH dimensions' per-file spread tight") {
    val g = grid(32) // 1024 points, 5 bits per dim
    def avgYSpread(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id().as("p"))
        .agg((max(col("y")) - min(col("y"))).as("spread"))
        .agg(avg("spread")).head.getDouble(0)
    val zLaid = ZOrder.layout(g, "x", "y", bits = 5, numPartitions = 8)
    val xSorted = g.repartitionByRange(8, col("x")).sortWithinPartitions("x")
    val (zs, xs) = (avgYSpread(zLaid), avgYSpread(xSorted))
    // x-sorted files each span the FULL y range; z-ordered files cover
    // compact rectangles, so y stats stay usable for pruning.
    assert(xs == 31.0, s"x-sort baseline drifted: $xs")
    assert(zs <= 16.0, s"z-order y-spread too wide: $zs")
  }

  test("layout is a pure rewrite: row multiset unchanged") {
    val g = grid(16)
    val laid = ZOrder.layout(g, "x", "y", bits = 4, numPartitions = 4)
    assert(laid.count() == 256)
    assert(laid.except(g).isEmpty && g.except(laid).isEmpty)
  }

  test("zValueSql mirrors zValue (spot check via spark.sql)") {
    // Evaluate the generated SQL text in Spark itself: identical grammar
    // for >> & << on BIGINT, so this pins the generator's arithmetic.
    val sql = ZOrder.zValueSql("7", "5", 3)
    val viaSql = spark.sql(s"SELECT $sql AS z").head.getLong(0)
    import spark.implicits._
    val viaColumn = Seq((7, 5)).toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 3)).head.getLong(0)
    assert(viaSql == viaColumn)
  }
}
