package graft

import java.nio.file.Files

/** Round-14 wave-16 pins: time-windowed funnel (hand journeys incl.
  * strictness and the inclusive 7-day boundary) and the XmR control
  * chart (hand series with a worked ooc clearing, constant and
  * single-point degenerates). */
class FunnelXmrSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fx").toString
    rows.zipWithIndex.map { case ((u, ts, ty, v), i) =>
      (i.toLong, ts, u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("window funnel: hand journeys across all levels") {
    val d = dayNs
    val dir = eventsDir(Seq(
      // u1: full funnel inside the window -> 3
      (1L, 0L, "signup", 1.0), (1L, d, "click", 1.0),
      (1L, 2 * d, "purchase", 1.0),
      // u2: click 8 days after signup, outside -> 1
      (2L, 0L, "signup", 1.0), (2L, 8 * d, "click", 1.0),
      // u3: purchase 8 days after the click -> 2
      (3L, 0L, "signup", 1.0), (3L, d, "click", 1.0),
      (3L, 9 * d, "purchase", 1.0),
      // u4: no signup at all -> 0
      (4L, 0L, "click", 1.0), (4L, d, "purchase", 1.0),
      // u5: noise purchase first, then a clean chain -> 3
      (5L, 0L, "purchase", 1.0), (5L, d, "signup", 1.0),
      (5L, 2 * d, "click", 1.0), (5L, 3 * d, "purchase", 1.0),
      // u6: signup only -> 1
      (6L, 0L, "signup", 1.0)))
    val got = SparkEntry.queries("q_e_window_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(0L -> ((1L, 1666L)), 1L -> ((2L, 3333L)),
      2L -> ((1L, 1666L)), 3L -> ((2L, 3333L))))
  }

  test("window funnel: strict order at equality, inclusive 7-day boundary") {
    val d = dayNs
    val dir = eventsDir(Seq(
      // click at the same instant as signup does NOT advance (strict >)
      (1L, 0L, "signup", 1.0), (1L, 0L, "click", 1.0),
      // click at exactly signup + 7d is IN (inclusive window edge)
      (2L, 0L, "signup", 1.0), (2L, 7 * d, "click", 1.0)))
    val got = SparkEntry.queries("q_e_window_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L)) // one user at level 1, one at 2
  }

  test("xmr: hand series with one spike, worked clearing") {
    // Daily cents 100 x3, 200, 100 x4: n=8, sx=900, smr=200.
    // ooc for x: |x*8-900| * 100 * 7 > 266 * 8 * 200 = 425600
    //   x=200: 700*700 = 490000 > 425600 -> out of control
    //   x=100: 100*700 =  70000           -> in control
    val vals = Seq(100L, 100L, 100L, 200L, 100L, 100L, 100L, 100L)
    val dir = eventsDir(vals.zipWithIndex.map { case (c, day) =>
      (1L, day * dayNs, "view", c / 100.0)
    })
    val r = SparkEntry.queries("q_stats_xmr")(spark, dir)
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))).toMap
    // center4 = 900*10^4/8 = 1125000; mrbar4 = 200*10^4/7 = 285714;
    // ucl4 = 1125000 + 285714*266//100 = 1884999; lcl4 = 365001.
    assert(r("view") == (8L, 1125000L, 285714L, 1884999L, 365001L, 1L))
  }

  test("xmr: constant series has zero-width limits and no excursions") {
    val dir = eventsDir((0 until 5).map(day =>
      (1L, day * dayNs, "view", 3.0)))
    val r = SparkEntry.queries("q_stats_xmr")(spark, dir).collect()(0)
    assert(r.getLong(3) == 0L)               // mrbar4
    assert(r.getLong(4) == r.getLong(2))     // ucl == center
    assert(r.getLong(5) == r.getLong(2))     // lcl == center
    assert(r.getLong(6) == 0L)               // n_ooc
  }

  test("xmr: single-day series reports sentinels, never divides by zero") {
    val dir = eventsDir(Seq((1L, 0L, "view", 5.0)))
    val r = SparkEntry.queries("q_stats_xmr")(spark, dir).collect()(0)
    assert(r.getLong(1) == 1L)
    assert(r.getLong(3) == -1L && r.getLong(4) == -1L && r.getLong(5) == -1L)
    assert(r.getLong(6) == 0L)
  }
}
