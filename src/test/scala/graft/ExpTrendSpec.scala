package graft

import java.nio.file.Files

/** Round-15 pins for q_exp_trend: the cleared Cochran–Armitage algebra on
  * a planted monotone trend (hand BigInt recompute), the flat-conversion
  * zero read, and the degenerate sentinels. */
class ExpTrendSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** Users as (eventCount, converts): event i of user u at distinct ts. */
  private def run(users: Seq[(Int, Boolean)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-trend").toString
    users.zipWithIndex.flatMap { case ((nEv, conv), u) =>
      val uid = u.toLong + 1
      val views = (0 until (if (conv) nEv - 1 else nEv)).map(k =>
        (uid * 100 + k, k.toLong * dayNs + uid, uid, "view", 0.0))
      val buy =
        if (conv) Seq((uid * 100 + 99, dayNs + uid, uid, "purchase", 1.0))
        else Seq.empty
      views ++ buy
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_exp_trend")(spark, dir).collect()
  }

  private def ca(cells: Seq[(Long, Long, Long)]): BigInt = {
    // cells = (w, n, r); the query's cleared Z²·10⁶.
    val nn = BigInt(cells.map(_._2).sum); val rr = BigInt(cells.map(_._3).sum)
    val swr = BigInt(cells.map(c => c._1 * c._3).sum)
    val swn = BigInt(cells.map(c => c._1 * c._2).sum)
    val sw2n = BigInt(cells.map(c => c._1 * c._1 * c._2).sum)
    val d = nn * swr - rr * swn
    (nn * d * d * 1000000) / (rr * (nn - rr) * (nn * sw2n - swn * swn))
  }

  test("planted monotone trend is significant and matches the hand algebra") {
    // Bucket 0 (<20 events): 10 users, 0 convert. Bucket 4 (80+): 10
    // users, 9 convert. A maximal two-point trend.
    val users = Seq.fill(10)((2, false)) ++
      Seq.fill(9)((85, true)) ++ Seq((85, false))
    val got = run(users)
    assert(got.length == 2, "two buckets: w=0 and w=4")
    val cells = got.map(r => (r.getAs[Long]("w"), r.getAs[Long]("n"),
      r.getAs[Long]("r"))).toSeq
    assert(cells.toSet == Set((0L, 10L, 0L), (4L, 10L, 9L)))
    val z2 = got.head.getAs[Long]("z2_6")
    assert(BigInt(z2) == ca(cells), "cleared CA algebra")
    assert(got.head.getAs[Long]("trend_sig") == 1L,
      s"0% -> 90% across buckets must flag (z2_6=$z2)")
  }

  test("flat conversion reads exactly zero and does not flag") {
    // Both buckets convert at exactly 50% — D = N·Σwr − R·Σwn = 0.
    val users = Seq.fill(5)((2, false)) ++ Seq.fill(5)((2, true)) ++
      Seq.fill(5)((85, false)) ++ Seq.fill(5)((85, true))
    val got = run(users)
    assert(got.head.getAs[Long]("z2_6") == 0L)
    assert(got.head.getAs[Long]("trend_sig") == 0L)
  }

  test("degenerate corpora read the -1 sentinel") {
    // Nobody converts -> R = 0.
    val none = run(Seq.fill(6)((3, false)))
    assert(none.head.getAs[Long]("z2_6") == -1L)
    // Single bucket -> zero score variance (everyone converts too).
    val one = run(Seq.fill(6)((3, true)))
    assert(one.head.getAs[Long]("z2_6") == -1L)
  }
}
