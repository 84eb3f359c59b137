package graft

import java.nio.file.Files

/** Round-15 pins for q_e_concurrency: hand-built sessions with known
  * hour overlaps — the closed-interval membership, the gap-cut into two
  * sessions, n_starting attribution, and tie ordering. */
class ConcurrencySpec extends SparkSpecBase {

  private val hourNs = 3600L * 1000 * 1000 * 1000

  private def run(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-conc").toString
    rows.map { case (id, ts, u) => (id, ts, u, "view", 0.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_e_concurrency")(spark, dir).collect()
      .map(r => (r.getAs[Long]("hour_idx"), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_starting"), r.getAs[Long]("day"),
        r.getAs[Long]("hour_of_day"))).toSeq
  }

  test("interval overlap, gap cut, and start attribution by hand") {
    // User 1: events at h0+5min and h0+20min (one session inside hour 0),
    // then at h2+5min after a >30min gap (a SECOND session in hour 2).
    // User 2: one session spanning hours 0..1 (events 25min apart bridge
    // the hour boundary without a gap cut).
    val m = 60L * 1000 * 1000 * 1000
    val rows = Seq(
      (1L, 5L * m, 1L), (2L, 20L * m, 1L),
      (3L, 2L * hourNs + 5L * m, 1L),
      (4L, 40L * m, 2L), (5L, 65L * m, 2L))
    val got = run(rows)
    val byHour = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byHour(0L) == ((2L, 2L)),
      "hour 0: user1 session + user2 session, both starting here")
    assert(byHour(1L) == ((1L, 0L)),
      "hour 1: user2's session is still open (closed-interval membership)")
    assert(byHour(2L) == ((1L, 1L)),
      "hour 2: user1's SECOND session (the 100-min gap cut it)")
    // Ordering: n_active desc, then earlier hour — hour 0 leads.
    assert(got.head._1 == 0L && got.head._4 == 0L && got.head._5 == 0L)
  }
}
