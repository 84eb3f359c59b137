package graft

import java.nio.file.Files

/** Wave-18 pins: gaps-and-islands streak histogram (hand-built calendar)
  * and effect sizes (hand-computed Cohen's d / Cliff's delta on separated
  * and dominated samples). */
class StreaksEffectSpec extends SparkSpecBase {

  private val hourNs = 3600L * 1000 * 1000 * 1000
  private val dayNs = 24L * hourNs

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-streak").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("gap islands: hand calendar yields the exact streak histogram") {
    // u1 active days {0,1,2, 5, 9,10} → streaks 3,1,2.
    // u2 active days {0, 2,3} (day 2 twice — distinct guard) → 1,2.
    val active = Seq((1L, Seq(0L, 1L, 2L, 5L, 9L, 10L)),
      (2L, Seq(0L, 2L, 2L, 3L)))
    val rows = for {
      (u, days) <- active; (d, i) <- days.zipWithIndex
    } yield ((u * 100 + i).toLong, d * dayNs + i, u, "view", 1.0)
    val got = SparkEntry.queries("q_w_gap_islands")(
      spark, eventsDir(rows)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // len 1: u1 day5 + u2 day0 → 2 islands, 2 users;
    // len 2: u1 {9,10} + u2 {2,3} → 2 islands, 2 users;
    // len 3: u1 {0,1,2} → 1 island, 1 user.
    assert(got == Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 1L, 1L)))
  }

  test("effect size: fully separated samples give Cliff delta = +1") {
    // am daily totals {300,400} cents, pm {100,200}: every am day beats
    // every pm day → delta = 1.0. Cohen's d: mx=350, my=150, pooled
    // var = (5000+5000)/2 = 5000 → d = 200/70.71 = 2.8284 → 28284.
    val rows = Seq(
      (1L, 0L * dayNs + 1L * hourNs, 1L, "t", 3.00),
      (2L, 1L * dayNs + 2L * hourNs, 1L, "t", 4.00),
      (3L, 0L * dayNs + 13L * hourNs, 1L, "t", 1.00),
      (4L, 1L * dayNs + 14L * hourNs, 1L, "t", 2.00))
    val r = SparkEntry.queries("q_stats_effect_size")(
      spark, eventsDir(rows)).collect().head
    assert((r.getLong(1), r.getLong(2)) == (2L, 2L), "n_am, n_pm")
    assert((r.getLong(3), r.getLong(4)) == (350L, 150L), "means")
    assert(r.getLong(5) == 28284L, "d = 2*sqrt(2) in 1e-4")
    assert(r.getLong(6) == 10000L, "delta = +1")
  }

  test("effect size: dominated-by-pm sample floors the negative delta") {
    // am {100}, pm {200,300}: gt=0, lt=2, nm=2 → delta4 = -10000 exactly.
    val rows = Seq(
      (1L, 0L * dayNs + 1L * hourNs, 1L, "t", 1.00),
      (2L, 0L * dayNs + 13L * hourNs, 1L, "t", 2.00),
      (3L, 1L * dayNs + 14L * hourNs, 1L, "t", 3.00))
    val r = SparkEntry.queries("q_stats_effect_size")(
      spark, eventsDir(rows)).collect().head
    assert(r.getLong(6) == -10000L)
    // n+m-2 = 1, am variance 0 but pm variance > 0 → d defined & negative.
    assert(r.getLong(5) < 0L)
  }

  test("effect size: zero pooled variance guards to d = 0") {
    val rows = Seq(
      (1L, 0L * dayNs + 1L * hourNs, 1L, "t", 2.00),
      (2L, 1L * dayNs + 1L * hourNs, 1L, "t", 2.00),
      (3L, 0L * dayNs + 13L * hourNs, 1L, "t", 2.00),
      (4L, 1L * dayNs + 13L * hourNs, 1L, "t", 2.00))
    val r = SparkEntry.queries("q_stats_effect_size")(
      spark, eventsDir(rows)).collect().head
    assert(r.getLong(5) == 0L && r.getLong(6) == 0L)
  }
}
