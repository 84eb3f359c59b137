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

  test("as-of matches brute force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
    val right = (0 until 120).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, s"v$i"))
    val expected = left.map { case (id, k, t) =>
      val best = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption // latest rt; ties by rv like the window's row order
      id -> best.map(_._3)
    }.toMap
    val got = AsOfJoin.asOf(left.toDF("id", "k", "t"),
        right.toDF("k", "rt", "rv"), Seq("k"), "t", "rt", Seq("rv"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("rv"))).toMap
    // compare only ids whose winning timestamp is unique (tie order between
    // equal-rt right rows is not part of the contract)
    val unambiguous = left.filter { case (_, k, t) =>
      val eligible = right.filter(r => r._1 == k && r._2 <= t)
      eligible.isEmpty || eligible.count(_._2 == eligible.map(_._2).max) == 1
    }.map(_._1).toSet
    unambiguous.foreach(id => assert(got(id) == expected(id), s"id=$id"))
    assert(unambiguous.size > 200) // the comparison actually covers most rows
  }

  test("range join matches brute force on random intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (0 until 200).map(i => (i.toLong, rnd.nextInt(10000).toDouble))
    val ivs = (0 until 60).map(i => {
      val lo = rnd.nextInt(9000)
      (s"iv$i", lo.toDouble, (lo + rnd.nextInt(2000)).toDouble)
    })
    val expected = (for {
      (id, x) <- pts; (iv, lo, hi) <- ivs if x >= lo && x <= hi
    } yield (id, iv)).toSet
    val got = graft.operators.RangeJoin.pointInInterval(
        pts.toDF("id", "x"), ivs.toDF("iv", "lo", "hi"),
        "x", "lo", "hi", bucketWidth = 500L)
      .select("id", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == expected)
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
