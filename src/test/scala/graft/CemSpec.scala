package graft

import java.nio.file.Files

/** Round-15 pins for q_e_cem: strata/means/ATT recomputed by hand from the
  * SAME md5 "did" arm rule, and the pruning contract — a stratum holding
  * only one arm reads matched = 0, diff6 = 0, and is excluded from ATT. */
class CemSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cem").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private def arm(u: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"did|$u".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 2
  }

  private def m6(s: Long, n: Long): Long =
    if (n == 0) 0L
    else if (s >= 0) s * 1000000L / n
    else -((-s) * 1000000L / n)

  test("strata, means and weighted ATT match the hand algebra; lone-arm stratum is pruned") {
    // Days 0 (pre) and 2 (post); mid = 1. Users 1..20: one pre view
    // (bucket 1, non-buyer), one post purchase of 10 + u dollars.
    // User 99: seven pre views (bucket 3) — alone in its stratum.
    val users = 1L to 20L
    val rows =
      users.flatMap(u => Seq(
        (u * 10L, 0L * dayNs + u, u, "view", 0.0),
        (u * 10L + 1, 2L * dayNs + u, u, "purchase", 10.0 + u))) ++
      (0 until 7).map(k =>
        (990L + k, 0L * dayNs + 99 + k, 99L, "view", 0.0)) :+
      (999L, 2L * dayNs + 99, 99L, "purchase", 50.0)
    val got = SparkEntry.queries("q_e_cem")(spark, eventsDir(rows))
      .collect()
    assert(got.length == 2, "two strata: (1,0) and (3,0)")
    val t = users.filter(arm(_) == 1)
    val c = users.filter(arm(_) == 0)
    assert(t.nonEmpty && c.nonEmpty, "fixture must populate both arms")
    def cents(u: Long) = 1000L + 100L * u
    val tm = m6(t.map(cents).sum, t.size)
    val cm = m6(c.map(cents).sum, c.size)
    val s10 = got.find(r => r.getAs[Long]("act_bucket") == 1L).get
    assert(s10.getAs[Long]("pre_buyer") == 0L)
    assert(s10.getAs[Long]("n_treat") == t.size.toLong)
    assert(s10.getAs[Long]("n_ctrl") == c.size.toLong)
    assert(s10.getAs[Long]("treat_m6") == tm)
    assert(s10.getAs[Long]("ctrl_m6") == cm)
    assert(s10.getAs[Long]("matched") == 1L)
    assert(s10.getAs[Long]("diff6") == tm - cm)
    val s30 = got.find(r => r.getAs[Long]("act_bucket") == 3L).get
    assert(s30.getAs[Long]("n_treat") + s30.getAs[Long]("n_ctrl") == 1L)
    assert(s30.getAs[Long]("matched") == 0L, "lone-arm stratum is pruned")
    assert(s30.getAs[Long]("diff6") == 0L)
    // ATT over matched strata only — the lone stratum cannot contribute,
    // so the weighted average collapses to stratum (1,0)'s gap exactly.
    got.foreach(r => assert(r.getAs[Long]("att6") == tm - cm))
  }
}
