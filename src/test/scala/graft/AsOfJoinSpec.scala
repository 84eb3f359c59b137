package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: most recent right row with time <= left time,
  * inclusive at equality, null before the first right row. */
class AsOfJoinSpec extends SparkSpecBase {

  test("as-of picks the latest effective right row per key") {
    import spark.implicits._
    val left = Seq((1L, "k1", 10L), (2L, "k1", 20L), (3L, "k1", 5L),
        (4L, "k2", 100L), (5L, "k3", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "r@10"), ("k1", 15L, "r@15"),
        ("k2", 99L, "r@99"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("rv")).toMap
    assert(out(1L) == "r@10") // inclusive at equality
    assert(out(2L) == "r@15") // latest effective, not first
    assert(out(3L) == null)   // before any right row
    assert(out(4L) == "r@99")
    assert(out(5L) == null)   // key with no right rows at all
  }

  test("range join matches overlapping intervals exactly, equi-join plan") {
    import spark.implicits._
    val pts = Seq((1L, 5.0), (2L, 95.0), (3L, 150.0), (4L, 999.0))
      .toDF("id", "x")
    val ivs = Seq(("a", 0.0, 100.0), ("b", 90.0, 200.0)).toDF("iv", "lo", "hi")
    val out = graft.operators.RangeJoin.pointInInterval(
        pts, ivs, "x", "lo", "hi", bucketWidth = 50L)
      .select("id", "iv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b")))
    val p = graft.operators.RangeJoin.pointInInterval(
        pts, ivs, "x", "lo", "hi", bucketWidth = 50L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"quadratic plan:\n$p")
  }

  test("as-of plan is one shuffle on the key, no join operator") {
    import spark.implicits._
    val left = Seq((1L, "k1", 10L)).toDF("id", "k", "t")
    val right = Seq(("k1", 5L, "x")).toDF("k", "rt", "rv")
    val p = AsOfJoin.asOf(left, right, Seq("k"), "t", "rt", Seq("rv"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"expected join-free plan:\n$p")
    assert(p.contains("Window"))
  }
}
