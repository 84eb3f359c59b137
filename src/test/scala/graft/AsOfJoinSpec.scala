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
