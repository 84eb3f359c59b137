package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.{HilbertHelpers, HilbertIndex}

/** Hilbert index: hand-pinned quadrant values, curve contiguity (the
  * property that distinguishes it from Morton), parity between the
  * codegen'd kernel and the plain-Scala reference, and locality of the
  * resulting layout. */
class HilbertSpec extends SparkSpecBase {

  private def hcol(x: org.apache.spark.sql.Column,
                   y: org.apache.spark.sql.Column, bits: Int) =
    Bridge.column(HilbertIndex(
      Bridge.expression(x.cast("long")), Bridge.expression(y.cast("long")),
      bits))

  test("1-bit quadrants follow the U: (0,0)=0 (0,1)=1 (1,1)=2 (1,0)=3") {
    assert(HilbertHelpers.xy2d(1, 0, 0) == 0L)
    assert(HilbertHelpers.xy2d(1, 0, 1) == 1L)
    assert(HilbertHelpers.xy2d(1, 1, 1) == 2L)
    assert(HilbertHelpers.xy2d(1, 1, 0) == 3L)
  }

  test("curve is contiguous: consecutive d are Manhattan-adjacent cells") {
    val byD = (for { x <- 0 until 16; y <- 0 until 16 }
      yield HilbertHelpers.xy2d(4, x, y) -> (x, y)).toMap
    assert(byD.size == 256)
    (0 until 255).foreach { d =>
      val ((x1, y1), (x2, y2)) = (byD(d), byD(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("codegen'd expression matches the plain-Scala reference") {
    import spark.implicits._
    val pts = for { x <- 0 until 40; y <- 0 until 40 } yield (x.toLong, y.toLong)
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"), hcol(col("x"), col("y"), 10).as("h"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == HilbertHelpers.xy2d(10, r.getLong(0), r.getLong(1)))
    }
  }

  test("null in, null out") {
    import spark.implicits._
    val df = Seq((Some(1L), None: Option[Long])).toDF("x", "y")
      .select(hcol(col("x"), col("y"), 4).as("h"))
    assert(df.head.isNullAt(0))
  }

  test("Hilbert layout beats x-sort on cross-dimension spread") {
    import spark.implicits._
    val g = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y")
    def avgYSpread(df: org.apache.spark.sql.DataFrame): Double =
      df.groupBy(spark_partition_id().as("p"))
        .agg((max(col("y")) - min(col("y"))).as("spread"))
        .agg(avg("spread")).head.getDouble(0)
    val laid = g.withColumn("_h", hcol(col("x"), col("y"), 5))
      .repartitionByRange(8, col("_h")).sortWithinPartitions("_h")
      .drop("_h")
    val xSorted = g.repartitionByRange(8, col("x")).sortWithinPartitions("x")
    assert(avgYSpread(xSorted) == 31.0)
    assert(avgYSpread(laid) <= 16.0,
      s"hilbert y-spread too wide: ${avgYSpread(laid)}")
  }
}
