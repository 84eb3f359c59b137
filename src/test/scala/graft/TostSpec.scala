package graft

import java.nio.file.Files

/** Round-14 wave-17 pins: TOST equivalence — zero-variance identical
  * and separated halves, an independent BigInt replay of the cleared
  * inequalities on a noisy configuration, and the insufficient-sample
  * sentinel. */
class TostSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000
  private val hourNs = 3600L * 1000 * 1000 * 1000

  /** One event per (day, half) carrying the half's whole dollar total. */
  private def eventsDir(am: Seq[Long], pm: Seq[Long]): String = {
    import spark.implicits._
    val rows =
      am.zipWithIndex.map { case (v, d) =>
        (d.toLong * 2, d * dayNs + 6 * hourNs, 1L, "view", v.toDouble) } ++
      pm.zipWithIndex.map { case (v, d) =>
        (d.toLong * 2 + 1, d * dayNs + 18 * hourNs, 1L, "view", v.toDouble) }
    val dir = Files.createTempDirectory("graft-tost").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): (Long, Long, Long, Long, String) = {
    val r = SparkEntry.queries("q_stats_tost")(spark, dir).collect()(0)
    (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7))
  }

  /** The cleared decision rules, re-derived independently in BigInt. */
  private def replay(am: Seq[Long], pm: Seq[Long]): (Long, Long, String) = {
    def big(x: Long) = BigInt(x)
    val (n1, n2) = (big(am.size), big(pm.size))
    val (s1, s2) = (am.map(big).sum, pm.map(big).sum)
    val (q1, q2) = (am.map(v => big(v) * v).sum, pm.map(v => big(v) * v).sum)
    val dnum = s1 * n2 - s2 * n1
    val b = s1 * n2 + s2 * n1
    val dd = n1 * n2
    val nse = (n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1) +
      (n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1)
    val u = n1 * n1 * (n1 - 1) * n2 * n2 * (n2 - 1)
    val rhs = BigInt(108241) * dd * dd * nse
    val eq =
      if (n1 < 2 || n2 < 2) 0L
      else if ((40 * dnum + b) > 0 &&
        (40 * dnum + b).pow(2) * 25 * u > rhs &&
        (b - 40 * dnum) > 0 &&
        (b - 40 * dnum).pow(2) * 25 * u > rhs) 1L else 0L
    val diff =
      if (n1 < 2 || n2 < 2) 0L
      else if (dnum.pow(2) * 625 * u > BigInt(9604) * dd * dd * nse) 1L
      else 0L
    val verdict =
      if (n1 < 2 || n2 < 2) "insufficient"
      else if (eq == 1 && diff == 1) "equivalent_and_different"
      else if (eq == 1) "equivalent"
      else if (diff == 1) "different"
      else "inconclusive"
    (eq, diff, verdict)
  }

  test("identical halves are equivalent") {
    val am = Seq.fill(10)(100L); val pm = Seq.fill(10)(100L)
    val (d6, delta6, eq, diff, v) = run(eventsDir(am, pm))
    assert(d6 == 0L && delta6 == 5000000L) // 5% of the $100 average mean
    assert((eq, diff, v) == ((1L, 0L, "equivalent")))
  }

  test("gross separation is different, not equivalent") {
    val am = Seq.fill(10)(100L); val pm = Seq.fill(10)(200L)
    val (d6, _, eq, diff, v) = run(eventsDir(am, pm))
    assert(d6 == -100000000L)
    assert((eq, diff, v) == ((0L, 1L, "different")))
  }

  test("noisy configurations match the independent BigInt replay") {
    val cases = Seq(
      (Seq(0L, 200, 0, 200, 0, 200, 0, 200), Seq.fill(8)(100L)),
      (Seq(98L, 102, 99, 101, 100, 100, 97, 103), Seq.fill(8)(100L)),
      (Seq(90L, 110, 95, 105), Seq(120L, 80, 110, 90)))
    cases.foreach { case (am, pm) =>
      val (_, _, eq, diff, v) = run(eventsDir(am, pm))
      assert((eq, diff, v) == replay(am, pm), s"case am=$am pm=$pm")
    }
  }

  test("single-day half reports the insufficient sentinel") {
    val (_, _, eq, diff, v) = run(eventsDir(Seq(100L), Seq(100L, 100L)))
    assert((eq, diff, v) == ((0L, 0L, "insufficient")))
  }
}
