package graft

import java.nio.file.Files

/** Round-14 wave-22 pins: growth accounting — a hand weekly timeline
  * covering every state (new, retained, resurrected, churned), the
  * horizon bound on churn, and the quick-ratio sentinel. */
class GrowthAccountingSpec extends SparkSpecBase {

  private val weekNs = 7L * 86400 * 1000 * 1000 * 1000

  test("hand timelines across all four states") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ga").toString
    // Weeks active per user:
    //   u1: 0,1,2   (new @0, retained @1,2; never churns inside horizon)
    //   u2: 0,2     (new @0, churned @1, resurrected @2)
    //   u3: 1       (new @1, churned @2)
    //   u4: 2       (new @2 — corpus ends at week 2, no churn emitted)
    val active = Seq(1L -> Seq(0L, 1L, 2L), 2L -> Seq(0L, 2L),
      3L -> Seq(1L), 4L -> Seq(2L))
    val rows = for {
      (u, weeks) <- active; wk <- weeks
    } yield (u * 100 + wk, wk * weekNs + u * 1000L, u, "view", 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_e_growth_accounting")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // week 0: u1,u2 new                              -> 2/0/0/0 net +2, qr -1
    // week 1: u3 new, u1 retained, u2 churned        -> 1/1/0/1 net  0, qr 10000
    // week 2: u4 new, u1 retained, u2 resurrected,
    //         u3 churned                             -> 1/1/1/1 net +1, qr 20000
    assert(got(0L) == (2L, 0L, 0L, 0L, 2L, -1L))
    assert(got(1L) == (1L, 1L, 0L, 1L, 0L, 10000L))
    assert(got(2L) == (1L, 1L, 1L, 1L, 1L, 20000L))
    assert(!got.contains(3L), "no churn row past the corpus horizon")
  }
}
