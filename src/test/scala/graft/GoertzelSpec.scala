package graft

import java.nio.file.Files

/** Round-15 pins for q_ts_goertzel: full-output equality against an
  * in-test BigInt replica of the fixed-point recursion, the planted
  * weekly-cycle read (period-7 power dominates period-5), and the
  * constant-table anchors. */
class GoertzelSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  private def c(p: Int): Long =
    math.floor(16384.0 * 2.0 * math.cos(2 * math.Pi / p) + 0.5).toLong

  private def fx(cv: Long, s: Long): Long =
    if (s >= 0) cv * s / 16384 else -(cv * -s / 16384)

  /** The query's contract replayed naively over the daily counts. */
  private def brute(xs: Seq[Long], p: Int): (Long, Long, Long) = {
    val cv = c(p)
    val (a, b) = xs.foldLeft((0L, 0L)) { case ((a, b), x) =>
      (x + fx(cv, a) - b, a)
    }
    val pw = (BigInt(a) * a + BigInt(b) * b - BigInt(fx(cv, a)) * b)
      .max(BigInt(0)) / 1000000
    (a, b, pw.toLong)
  }

  /** One event per unit of count on each day. */
  private def run(counts: Seq[Int]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-goe").toString
    counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(k =>
        (d * 1000L + k, d.toLong * dayNs + k, k.toLong, "view", 0.0))
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_ts_goertzel")(spark, dir).collect()
      .map(r => r.getAs[Long]("period") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("s1"), r.getAs[Long]("s2"),
          r.getAs[Long]("power_mega"), r.getAs[Long]("c14"))).toMap
  }

  test("constants: C7 and C5 match the emission formula") {
    assert(c(7) == 20431L, "2^14 * 2cos(2pi/7) rounds to 20431")
    assert(c(5) == 10126L, "2^14 * 2cos(2pi/5) rounds to 10126")
  }

  test("full output equals the BigInt replica on an irregular series") {
    val xs = Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7)
    val got = run(xs)
    val longs = xs.map(_.toLong)
    Seq(7, 5).foreach { p =>
      val (a, b, pw) = brute(longs, p)
      val (n, s1, s2, pm, c14) = got(p.toLong)
      assert(n == xs.size.toLong)
      assert(c14 == c(p))
      assert((s1, s2, pm) == (a, b, pw), s"period $p diverged from replica")
    }
  }

  test("a planted weekly cycle resonates at period 7, not period 5") {
    // Four full weeks of a strong period-7 pattern, scaled so the power
    // lands well above the 1e6 reporting step.
    val week = Seq(900, 100, 100, 100, 100, 100, 100)
    val got = run(Seq.fill(4)(week).flatten)
    assert(got(7L)._4 > 10 * got(5L)._4,
      s"weekly power ${got(7L)._4} must dominate workweek ${got(5L)._4}")
    assert(got(7L)._4 > 0L)
  }
}
