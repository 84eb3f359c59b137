package graft

import java.nio.file.Files

/** Round-15 pins for classical seasonal decomposition (q_ts_decompose)
  * and offline bandit replay evaluation (q_e_bandit_replay): hand
  * corpora where every branch is derivable by inspection, plus
  * structural laws on the real corpus. */
class DecomposeBanditSpec extends SparkSpecBase {

  private val DAY = 86400L * 1000 * 1000 * 1000

  test("decompose: a perfectly weekly series has zero remainder") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dec").toString
    // 14 days, count 7 on days 0 and 7, count 1 elsewhere: every full
    // 7-row window holds exactly one spike, so trend = 13e6 div 7 =
    // 1857142 everywhere, the spike dow (4) carries +5142858, every
    // other dow carries -857142, and the remainder is EXACTLY zero.
    val rows = (0 until 14).flatMap { d =>
      val n = if (d % 7 == 0) 7 else 1
      (0 until n).map(k => (d * 100L + k, d * DAY + k * 1000000L, "pulse"))
    }
    rows.toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_ts_decompose")(spark, dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == (0L to 6L).toSet)
    out.foreach { case (dow, (nDow, seasonal, nDays, nTrend, mad)) =>
      assert(nDays == 14L && nTrend == 8L && mad == 0L,
        s"dow $dow: periodic series must decompose with zero remainder")
      if (dow == 4L) assert(seasonal == 5142858L && nDow == 1L)
      else if (dow == 0L) assert(seasonal == -857142L && nDow == 2L)
      else assert(seasonal == -857142L && nDow == 1L)
    }
  }

  test("decompose real corpus: rows-window trend coverage law") {
    val rows = SparkEntry.queries("q_ts_decompose")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (ty, rs) =>
      val nDays = rs.head.getLong(4)
      val nTrend = rs.head.getLong(5)
      assert(nTrend == nDays - 6,
        s"$ty: a rows-based +-3 window must define n-6 trend points")
      assert(rs.map(_.getLong(2)).sum == nTrend,
        s"$ty: per-dow counts must partition the trend days")
    }
  }

  test("bandit replay: hand-walked greedy policy with optimistic init") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bandit").toString
    val HI = 150.0 // reward 1
    val LO = 5.0 //   reward 0
    // One user; arms sorted: click < error < purchase < signup < view.
    // Walk: view(no match, cold pick=click), click HI(match, unpulled),
    // click LO(pick error, no match), error LO(match), purchase HI
    // (match), signup LO(match), view HI(pick purchase: mean 1e6 tops
    // click 5e5, no match), purchase LO(match).
    val ev = Seq(
      (1L, "view", LO), (2L, "click", HI), (3L, "click", LO),
      (4L, "error", LO), (5L, "purchase", HI), (6L, "signup", LO),
      (7L, "view", HI), (8L, "purchase", LO))
    ev.zipWithIndex.map { case ((id, ty, v), i) =>
      (id, (i + 1) * 1000000000L, 1L, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_e_bandit_replay")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out("click") == ((2L, 1L, 1L, 5000L, 10000L)))
    assert(out("error") == ((1L, 1L, 0L, 10000L, 0L)))
    assert(out("purchase") == ((2L, 2L, 1L, 10000L, 5000L)))
    assert(out("signup") == ((1L, 1L, 0L, 10000L, 0L)))
    assert(out("view") == ((2L, 0L, 0L, 0L, -1L)))
  }

  test("bandit replay real corpus: replay subset laws + determinism") {
    val a = SparkEntry.queries("q_e_bandit_replay")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q_e_bandit_replay")(
      spark, "/root/testdata/sf0.001").collect().map(_.toSeq).toSeq
    assert(a == b, "replay must be deterministic")
    a.foreach { r =>
      val (logged, matched, suc) =
        (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
          r(3).asInstanceOf[Long])
      assert(matched <= logged && suc <= matched,
        s"replay counts must nest: $r")
    }
  }
}
