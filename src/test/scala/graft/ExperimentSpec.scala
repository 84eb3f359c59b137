package graft

import java.nio.file.Files

/** Wave-15 pins: the experimentation suite — SRM design audit (md5-arm
  * assignment replays by hand), two-proportion A/A χ² (hand 2×2 algebra),
  * and CUPED θ/ρ² on a constructed pre/post covariate relation. */
class ExperimentSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-exp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("SRM: eight layers, arm counts sum to the user universe, no flag on balance") {
    // 64 users — md5 parity splits near 32/32 per layer; with n = 64 the
    // flag needs (a-b)^2 >= 3.84*64/1e0 → |a-b| >= 16, far beyond what a
    // uniform hash produces across eight independent layers at once.
    val rows = (1L to 64L).map(u => (u, u * dayNs, u, "view", 1.0))
    val got = SparkEntry.queries("q_exp_srm")(spark, eventsDir(rows))
      .collect()
    assert(got.length == 8)
    got.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == 64L,
        s"layer ${r.getLong(0)}: arms must partition the universe")
      val diff = r.getLong(1) - r.getLong(2)
      assert(r.getLong(3) == diff * diff * 1000000L / 64L, "chi2_6 algebra")
    }
    assert(got.map(_.getLong(0)).toSeq == (0L to 7L), "layers 0..7 ordered")
  }

  test("SRM: a degenerate one-user universe flags nothing (chi2 = 1e6 < 3.84e6)") {
    val got = SparkEntry.queries("q_exp_srm")(
      spark, eventsDir(Seq((1L, dayNs, 7L, "view", 1.0)))).collect()
    got.foreach { r =>
      assert(r.getLong(3) == 1000000L, "single user: (1-0)^2*1e6/1 = 1e6")
      assert(r.getLong(4) == 0L, "1e6 < 3841459 — below the 1-df cut")
    }
  }

  test("two-prop: cells, rates and chi2 match the hand 2x2 algebra") {
    // Build a universe where conversion is user-controlled, then recompute
    // the 2x2 from the SAME md5 arm rule the query uses.
    val users = 1L to 40L
    val converters = users.filter(_ % 5 == 0).toSet
    val base = users.map(u => (u, u * dayNs, u, "view", 1.0))
    val conv = converters.toSeq.sorted.map(u =>
      (1000L + u, u * dayNs + 1, u, "purchase", 2.0))
    val got = SparkEntry.queries("q_exp_two_prop")(
      spark, eventsDir(base ++ conv)).collect().head
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"0|$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val a = users.count(u => arm(u) == 0 && converters(u)).toLong
    val b = users.count(u => arm(u) == 0 && !converters(u)).toLong
    val c = users.count(u => arm(u) == 1 && converters(u)).toLong
    val d = users.count(u => arm(u) == 1 && !converters(u)).toLong
    assert(got.getLong(0) == a + b && got.getLong(1) == c + d)
    assert(got.getLong(2) == a && got.getLong(3) == c)
    assert(got.getLong(4) == a * 1000000L / (a + b))
    assert(got.getLong(5) == c * 1000000L / (c + d))
    val num = BigInt(a * d - b * c).pow(2) * (a + b + c + d) * 1000000
    val den = BigInt(a + b) * (c + d) * (a + c) * (b + d)
    assert(BigInt(got.getLong(6)) == num / den, "chi2_6")
  }

  test("CUPED: perfectly correlated pre/post collapses residual variance (rho2 = 1)") {
    // Users 1..10, purchase cents pre = 100*u at day 0, post = 200*u at
    // day 20 → Y = 2X exactly → theta = 2.0, var reduction = 10000 bp
    // (up to the two-step truncation, which is exact here because
    // cov*1e4 divides evenly: all moments are exact multiples).
    val rows = (1L to 10L).flatMap { u =>
      Seq((u * 2, 0L * dayNs, u, "purchase", u * 1.0),
        (u * 2 + 1, 20L * dayNs, u, "purchase", u * 2.0))
    }
    val r = SparkEntry.queries("q_exp_cuped")(spark, eventsDir(rows))
      .collect().head
    assert(r.getLong(0) == 10L, "n_users")
    assert(r.getLong(1) == (1L to 10L).map(_ * 100).sum, "pre cents")
    assert(r.getLong(2) == (1L to 10L).map(_ * 200).sum, "post cents")
    assert(r.getLong(3) == 2000000L, "theta = 2.0 in 1e-6 units")
    assert(r.getLong(4) == 10000L, "rho^2 = 1 → 10000 bp")
  }

  test("CUPED: anti-correlated covariate yields a negative theta (sign split)") {
    // pre = 100*u, post = 100*(11-u) → cov < 0, theta = -1 exactly.
    val rows = (1L to 10L).flatMap { u =>
      Seq((u * 2, 0L * dayNs, u, "purchase", u * 1.0),
        (u * 2 + 1, 20L * dayNs, u, "purchase", (11 - u) * 1.0))
    }
    val r = SparkEntry.queries("q_exp_cuped")(spark, eventsDir(rows))
      .collect().head
    assert(r.getLong(3) == -1000000L, "theta = -1.0")
    assert(r.getLong(4) == 10000L, "|rho| = 1 still removes all variance")
  }

  test("CUPED: constant pre-period (zero variance) guards to theta 0") {
    val rows = (1L to 6L).flatMap { u =>
      Seq((u * 2, 0L * dayNs, u, "purchase", 5.0),
        (u * 2 + 1, 20L * dayNs, u, "purchase", u * 1.0))
    }
    val r = SparkEntry.queries("q_exp_cuped")(spark, eventsDir(rows))
      .collect().head
    assert(r.getLong(3) == 0L && r.getLong(4) == 0L)
  }
}
