package graft

import java.nio.file.Files

/** Round-15 pins for q_e_decay_score: the shared fixed-point table
  * against an in-test recompute (anchor 2²⁰, exact half at age 7), the
  * per-user weighted sums by hand, the horizon zero-weight, and the
  * top-20 ordering with tie-break. */
class DecayScoreSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def w(age: Long): Long =
    if (age > 62) 0L
    else math.floor(math.pow(2.0, 20.0 - age / 7.0) + 0.5).toLong

  private def run(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-decay").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_e_decay_score")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("events_w20"), r.getAs[Long]("cents_w20"))).toSeq
  }

  test("weight anchors: 2^20 fresh, exact half at age 7, zero past day 62") {
    assert(w(0) == 1048576L)
    assert(w(7) == 524288L, "7-day half-life halves exactly")
    assert(w(14) == 262144L)
    // User 1 purchases on the anchor day and 70 days earlier (beyond the
    // horizon); user 2 purchases only at age 7.
    val got = run(Seq(
      (1L, 70L * dayNs + 1, 1L, "purchase", 10.0),
      (2L, 0L * dayNs + 1, 1L, "purchase", 10.0),
      (3L, 63L * dayNs + 1, 2L, "purchase", 10.0)))
    val u1 = got.find(_._1 == 1L).get
    assert(u1._2 == 2L)
    assert(u1._3 == w(0) + 0L, "age-70 event weighs zero")
    assert(u1._4 == 1000L * w(0))
    val u2 = got.find(_._1 == 2L).get
    assert(u2._4 == 1000L * w(7), "exactly half the fresh score")
  }

  test("per-user sums by hand; views add event mass but no cents") {
    val got = run(Seq(
      (1L, 0L * dayNs + 1, 1L, "purchase", 5.0),
      (2L, 1L * dayNs + 1, 1L, "view", 99.0),
      (3L, 2L * dayNs + 1, 1L, "purchase", 3.0),
      (4L, 2L * dayNs + 1, 2L, "purchase", 100.0)))
    // Anchor = day 2. ages: u1 events at 2,1,0; u2 at 0.
    val u1 = got.find(_._1 == 1L).get
    assert(u1._2 == 3L)
    assert(u1._3 == w(2) + w(1) + w(0))
    assert(u1._4 == 500L * w(2) + 300L * w(0), "the view adds no cents")
    val u2 = got.find(_._1 == 2L).get
    assert(u2._4 == 10000L * w(0))
    assert(got.head._1 == 2L, "ordered by decayed cents desc")
  }

  test("ties on decayed cents break by ascending user_id") {
    val got = run(Seq(
      (1L, 0L, 7L, "purchase", 1.0),
      (2L, 1L, 3L, "purchase", 1.0)))
    assert(got.map(_._1) == Seq(3L, 7L))
  }
}
