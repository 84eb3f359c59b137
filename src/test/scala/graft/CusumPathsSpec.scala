package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Round-14 pins: the CUSUM prefix-min closed form against a hand-walked
  * recursion, and session-path assembly (gap cut, order, truncation). */
class CusumPathsSpec extends SparkSpecBase {

  private val dayMs = 86400000L

  test("cusum: closed form equals the hand-walked max(0, S+x-mu) " +
      "recursion, alarms counted above mu") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cusum").toString
    // x = [10,10,10,10,50,50] cents; mu = 140 div 6 = 23.
    // Recursion: S = [0,0,0,0,27,54]; peak 54 at day 5; S > 23 on 2 days.
    val xs = Seq(10, 10, 10, 10, 50, 50)
    xs.zipWithIndex.map { case (c, d) =>
      (d.toLong, new Timestamp(d * dayMs), 1L, "drift", c / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_stats_cusum")(spark, dir).head
    assert((r.getAs[Long]("n_days"), r.getAs[Long]("mu_cents"),
      r.getAs[Long]("max_cusum"), r.getAs[Long]("peak_day"),
      r.getAs[Long]("n_alarm_days")) == ((6L, 23L, 54L, 5L, 2L)))
  }

  test("cusum: equal peaks resolve to the EARLIEST day") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cusum2").toString
    // x = [30,10,30,10]; mu = 20; S = [10,0,10,0] -> peak 10 at day 0.
    Seq(30, 10, 30, 10).zipWithIndex.map { case (c, d) =>
      (d.toLong, new Timestamp(d * dayMs), 1L, "tie", c / 100.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_stats_cusum")(spark, dir).head
    assert((r.getAs[Long]("max_cusum"), r.getAs[Long]("peak_day"),
      r.getAs[Long]("n_alarm_days")) == ((10L, 0L, 0L)))
  }

  test("session paths: 30-min gap cuts, (ts, event_id) order, 40-event " +
      "truncation, top-k by session count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-paths").toString
    def ev(id: Long, user: Long, ms: Long, typ: String) =
      (id, new Timestamp(ms), user, typ, 1.0)
    val s = 1000L
    // users 1 and 2: one "a>b>a" session each; user 1 gets a second
    // session ("c") past the 30-min gap; user 3: 45 "x" events 1s apart
    // -> ONE session whose path truncates to its first 40 events.
    val rows =
      Seq(ev(1, 1, 0, "a"), ev(2, 1, 10 * s, "b"), ev(3, 1, 20 * s, "a"),
        ev(4, 1, 20 * s + 31 * 60 * s, "c"),
        ev(5, 2, 0, "a"), ev(6, 2, 10 * s, "b"), ev(7, 2, 20 * s, "a")) ++
      (0 until 45).map(i => ev(100 + i, 3L, i * s, "x"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_e_session_paths")(spark, dir)
      .collect().map(r => (r.getAs[Long]("rk"), r.getAs[String]("path"),
        r.getAs[Long]("n_sessions"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_events")))
    assert(got.toSeq == Seq(
      (1L, "a>b>a", 2L, 2L, 6L),
      (2L, "c", 1L, 1L, 1L),
      (3L, Seq.fill(40)("x").mkString(">"), 1L, 1L, 45L)))
  }
}
