package graft

import java.nio.file.Files

/** Round-14 wave-28 pins: permutation entropy — the monotone-ramp zero,
  * the uniform-pattern maximum, tie handling, and a hand pattern census. */
class PermEntropySpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** One event type, one event per (day, copy): daily counts = series. */
  private def seriesDir(counts: Seq[Int]): String = {
    import spark.implicits._
    val rows = for {
      (c, day) <- counts.zipWithIndex; i <- 0 until c
    } yield (day * 1000L + i, day * dayNs + i, 1L, "view", 1.0)
    val dir = Files.createTempDirectory("graft-pe").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): (Long, Long, Long, Long) = {
    val r = SparkEntry.queries("q_ts_perm_entropy")(spark, dir).collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("monotone ramp: one pattern, zero entropy") {
    val (n, k, h, bp) = run(seriesDir(Seq(1, 2, 3, 4, 5, 6, 7, 8)))
    assert((n, k, h, bp) == ((6L, 1L, 0L, 0L)))
  }

  test("all six patterns once: entropy = ln 6, npe ~ 10000") {
    // Eight values whose six embedded triples realize all six legal
    // ordinal codes {0,1,3,4,6,7} exactly once (searched exhaustively):
    // (1,2,6)->0 (2,6,5)->1 (6,5,4)->7 (5,4,8)->4 (4,8,3)->3 (8,3,7)->6.
    // Uniform pattern census forces H = ln 6.
    val series = Seq(1, 2, 6, 5, 4, 8, 3, 7)
    val dir = seriesDir(series)
    val (n, k, h, bp) = run(dir)
    assert(n == 6L)
    assert(k == 6L, s"expected all 6 patterns, got $k")
    // H·n = ln(6)·6 − 6·ln(1) -> h_micro = floor(ln 6 · 1e6) = 1791759
    assert(h == 1791759L)
    assert(bp == 10000L)
  }

  test("ties rank the earlier element first (constant series is one pattern)") {
    val (n, k, h, bp) = run(seriesDir(Seq(3, 3, 3, 3, 3)))
    assert((n, k, h, bp) == ((3L, 1L, 0L, 0L)),
      "all-equal triples must share ONE pattern under the index tie rule")
  }

  test("hand census: alternating series uses exactly two patterns evenly") {
    // 1,9,1,9,1,9: triples (1,9,1) and (9,1,9) alternate -> two patterns,
    // 2+2 split, H = ln 2: h_micro = (floor(ln4*1e6)*4 - 2*(2*floor(ln2*1e6))) / 4
    val (n, k, h, _) = run(seriesDir(Seq(1, 9, 1, 9, 1, 9)))
    assert(n == 4L && k == 2L)
    val ln4 = math.floor(math.log(4.0) * 1e6).toLong
    val ln2 = math.floor(math.log(2.0) * 1e6).toLong
    assert(h == (ln4 * 4 - 2 * (ln2 * 2)) / 4)
  }
}
