package graft

import java.nio.file.Files

/** Pins for the integer-cleared daily-count ACF (`q_ts_acf`): hand-
  * computed correlations on an alternating series, zero-filled calendar
  * gaps, the sign-split truncation, and the degenerate single-day
  * corpus. */
class AcfSpec extends SparkSpecBase {

  private val dayNs = 86400000000000L

  /** Events parquet with `cnt(i)` events on day i (ts already in the
    * BIGINT-nanos contract the loader normalizes to). */
  private def eventsDir(counts: Seq[Long]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-acf").toString
    val rows = for {
      (n, d) <- counts.zipWithIndex
      j <- 0L until n
    } yield (d * 1000 + j, d * dayNs + j * 1000000L, j % 5,
      "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("alternating 2,4 series: r1 = -875000, r2 = +750000") {
    // N=8, c=[2,4,...], S=24; N*c-S = ±8; den = 8*64 = 512.
    // lag1: 7 pairs, each product -64 -> -448e6 div 512 = -875000
    // lag2: 6 pairs, each product +64 -> +384e6 div 512 = +750000
    val dir = eventsDir(Seq(2L, 4L, 2L, 4L, 2L, 4L, 2L, 4L))
    val got = SparkEntry.queries("q_ts_acf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got.size == 7)
    assert(got.head == ((1L, 8L, 7L, Some(-875000L))))
    assert(got(1) == ((2L, 8L, 6L, Some(750000L))))
    assert(got.forall(_._2 == 8L))
  }

  test("calendar gap zero-fills: missing day enters as c=0") {
    // days 0 and 2 populated (5, 7 events), day 1 absent -> c=[5,0,7].
    // S=12; dev = (3, -12, 9); den = 234.
    // lag1: 3*-12 + -12*9 = -144 -> -(144e6 div 234) = -615384
    // lag2: 3*9 = 27 -> 27e6 div 234 = 115384 (truncation, not floor)
    val dir = eventsDir(Seq(5L, 0L, 7L))
    val got = SparkEntry.queries("q_ts_acf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got.head == ((1L, 3L, 2L, Some(-615384L))))
    assert(got(1) == ((2L, 3L, 1L, Some(115384L))))
    // lags beyond the series length have no pairs and emit no row
    assert(got.size == 2)
  }

  test("single-day corpus: no lag pairs, empty result, no division") {
    val dir = eventsDir(Seq(9L))
    assert(SparkEntry.queries("q_ts_acf")(spark, dir).collect().isEmpty)
  }
}
