package graft

import graft.operators.AsOfJoin

/** Round-14 wave-15 pins: forward and nearest as-of directions —
  * inclusive-equality contracts, the backward tie rule, brute-force
  * parity on random data, and the no-join plan shape. */
class AsOfDirSpec extends SparkSpecBase {

  test("forward as-of picks the earliest right row at or after left time") {
    import spark.implicits._
    val left = Seq((1L, "k1", 10L), (2L, "k1", 16L), (3L, "k1", 99L),
        (4L, "k2", 100L), (5L, "k3", 50L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "r@10"), ("k1", 15L, "r@15"),
        ("k1", 20L, "r@20"), ("k2", 99L, "r@99"))
      .toDF("k", "rt", "rv")
    val out = AsOfJoin.asOfForward(left, right, Seq("k"), "t", "rt",
        Seq("rv"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("rv")).toMap
    assert(out(1L) == "r@10") // inclusive at equality
    assert(out(2L) == "r@20") // earliest at-or-after, not latest-before
    assert(out(3L) == null)   // after every right row
    assert(out(4L) == null)   // right row strictly before
    assert(out(5L) == null)   // key with no right rows
  }

  test("nearest as-of hand distances") {
    import spark.implicits._
    val left = Seq((1L, "k1", 12L), (2L, "k1", 16L), (3L, "k1", 15L),
        (4L, "k1", 3L), (5L, "k2", 7L), (6L, "k1", 10L))
      .toDF("id", "k", "t")
    val right = Seq(("k1", 10L, "b"), ("k1", 20L, "f")).toDF("k", "rt", "rv")
    val got = AsOfJoin.asOfNearest(left, right, Seq("k"), "t", "rt",
        Seq("rv"))
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("rv"), r.getAs[String]("rv_dir")))).toMap
    assert(got(1L) == (("b", "backward"))) // 2 back vs 8 fwd
    assert(got(2L) == (("f", "forward")))  // 6 back vs 4 fwd
    assert(got(3L) == (("b", "backward"))) // exact tie 5 vs 5 -> backward
    assert(got(4L) == (("b", "forward")))  // nothing behind -> next row (rt=10)
    assert(got(5L) == ((null, null)))      // no right rows at all
    assert(got(6L) == (("b", "backward"))) // coincident right: distance 0
  }

  test("nearest matches brute force on random data, plan has no join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (0 until 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", rnd.nextInt(1000).toLong))
    val right = (0 until 120).map(i =>
      (s"k${rnd.nextInt(10)}", rnd.nextInt(1000).toLong, s"v$i"))
    val df = AsOfJoin.asOfNearest(left.toDF("id", "k", "t"),
      right.toDF("k", "rt", "rv"), Seq("k"), "t", "rt", Seq("rv"))
    val got = df.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("rv"))).toMap
    val unambiguous = left.filter { case (_, k, t) =>
      val bs = right.filter(r => r._1 == k && r._2 <= t).map(_._2)
      val fs = right.filter(r => r._1 == k && r._2 > t).map(_._2)
      (bs.isEmpty || bs.count(_ == bs.max) == 1) &&
        (fs.isEmpty || fs.count(_ == fs.min) == 1)
    }
    unambiguous.foreach { case (id, k, t) =>
      val b = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption
      val f = right.filter(r => r._1 == k && r._2 > t)
        .sortBy(_._2).headOption
      val exp = (b, f) match {
        case (None, None)       => None
        case (Some(x), None)    => Some(x._3)
        case (None, Some(y))    => Some(y._3)
        case (Some(x), Some(y)) =>
          if (t - x._2 <= y._2 - t) Some(x._3) else Some(y._3)
      }
      assert(got(id) == exp, s"id=$id k=$k t=$t")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"nearest as-of must stay join-free:\n$plan")
  }
}
