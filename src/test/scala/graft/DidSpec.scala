package graft

import java.nio.file.Files

/** Round-15 pins for q_e_did: the 2×2 difference-in-differences contrast
  * recomputed by hand from the SAME md5 arm rule the query uses, the
  * parallel-shift null (a lift applied to BOTH arms must read did6 = 0),
  * and the zero-fill contract (a user with no purchases still counts in
  * the panel denominator). Day cuts pinned: days 0..3 → mid = 2, q = 1. */
class DidSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-did").toString
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

  /** Truncate-toward-zero micro-mean, the query's signedMean6. */
  private def m6(s: Long, n: Long): Long =
    if (n == 0) 0L
    else if (s >= 0) s * 1000000L / n
    else -((-s) * 1000000L / n)

  test("did6 matches the hand 2x2 contrast under a treated-only post lift") {
    val users = 1L to 16L
    // Views on day 0 and day 3 pin the range for every user; purchases:
    // 10.00 pre (day 0) for all, post (day 2) 10.00 + 5.00 if arm = 1.
    // User 17 views only — the zero-fill panel member.
    val views = (users :+ 17L).flatMap(u => Seq(
      (u * 10L, 0L * dayNs + u, u, "view", 0.0),
      (u * 10L + 1, 3L * dayNs + u, u, "view", 0.0)))
    val buys = users.flatMap(u => Seq(
      (u * 10L + 2, 0L * dayNs + u, u, "purchase", 10.0),
      (u * 10L + 3, 2L * dayNs + u, u, "purchase",
        if (arm(u) == 1) 15.0 else 10.0)))
    val got = SparkEntry.queries("q_e_did")(spark, eventsDir(views ++ buys))
      .collect().head
    val all = users :+ 17L
    val t = all.filter(arm(_) == 1)
    val c = all.filter(arm(_) == 0)
    assert(t.nonEmpty && c.nonEmpty, "fixture must populate both arms")
    def pre(u: Long) = if (u == 17L) 0L else 1000L
    def post(u: Long) =
      if (u == 17L) 0L else if (arm(u) == 1) 1500L else 1000L
    val did = (m6(t.map(post).sum, t.size) - m6(t.map(pre).sum, t.size)) -
      (m6(c.map(post).sum, c.size) - m6(c.map(pre).sum, c.size))
    assert(got.getAs[Long]("n_treat") == t.size.toLong)
    assert(got.getAs[Long]("n_ctrl") == c.size.toLong)
    assert(got.getAs[Long]("did6") == did, "hand 2x2 contrast")
    assert(got.getAs[Long]("did6") > 0, "treated post lift must read > 0")
    // All purchases sit on days 0 and 2; the pre-period halves (day 0 vs
    // day 1) shift identically across arms, so the placebo reads zero.
    assert(got.getAs[Long]("placebo_did6") ==
      (m6(0, t.size) - m6(t.map(pre).sum, t.size)) -
        (m6(0, c.size) - m6(c.map(pre).sum, c.size)))
  }

  test("a parallel shift (same lift on both arms) reads did6 = 0") {
    val users = 1L to 16L
    val views = users.flatMap(u => Seq(
      (u * 10L, 0L * dayNs + u, u, "view", 0.0),
      (u * 10L + 1, 3L * dayNs + u, u, "view", 0.0)))
    val buys = users.flatMap(u => Seq(
      (u * 10L + 2, 0L * dayNs + u, u, "purchase", 10.0),
      (u * 10L + 3, 2L * dayNs + u, u, "purchase", 25.0)))
    val got = SparkEntry.queries("q_e_did")(spark, eventsDir(views ++ buys))
      .collect().head
    assert(got.getAs[Long]("did6") == 0L,
      "identical group means: the contrast cancels exactly")
    assert(got.getAs[Long]("placebo_did6") == 0L)
  }
}
