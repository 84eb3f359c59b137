package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.FloatDot

class FloatDotSpec extends SparkSpecBase {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  test("float_dot equals the unrolled element_at formulation bit-for-bit") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rng.nextFloat()), Array.fill(64)(rng.nextFloat())))
    val df = rows.toDF("a", "b")
    val unrolled = (0 until 64).map(i =>
      element_at(col("a"), i + 1).cast("double") *
        element_at(col("b"), i + 1).cast("double")).reduce(_ + _)
    val out = df.select(dot(col("a"), col("b")).as("k"),
      unrolled.as("u")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("null array or null element yields NULL; empty arrays yield 0") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))),
      (None, Some(Seq(1.0f))),
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])))
      .toDF("a", "b")
    val out = df.select(dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 0.0)
  }

  test("length mismatch yields NULL, never a truncated partial dot") {
    import spark.implicits._
    // A corrupt short embedding must drop out of similarity (null), not
    // score a plausible truncated cosine that could fabricate a near-dup.
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).head.isNullAt(0))
  }
}
