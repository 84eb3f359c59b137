package graft

import java.nio.file.Files

/** Round-15 pins for SAX discretization + motif mining (q_ts_sax):
  * hand-derived symbols on a series with known empirical quartiles,
  * strict-inequality breakpoint semantics (a value AT a breakpoint does
  * not clear it), and the no-motif degenerate case for a constant
  * two-segment series. */
class SaxSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** One event per (type, day) carrying x/100 so the daily cent sum is
    * exactly x. */
  private def eventsDir(series: Map[String, Seq[Long]]): String = {
    import spark.implicits._
    val rows = series.toSeq.flatMap { case (typ, xs) =>
      xs.zipWithIndex.map { case (x, d) =>
        (d.toLong, d * dayNs + 1L, 1L, typ, x.toDouble / 100) }
    }
    val dir = Files.createTempDirectory("graft-sax").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(3).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("hand series: quartile breakpoints, strict >, word and motif") {
    // Daily cents: 4 segments of 4. Sorted: 10x5,20,30,40,50,60,70,80x5.
    // n=16 -> q1 = x@rank4 = 10, q2 = x@rank8 = 40, q3 = x@rank12 = 80.
    // seg sums 100/260/40/320 vs q*L 40/160/320 -> b, c, a, c ("bcac":
    // seg2's S=40 sits exactly AT q1*L=40 and must NOT clear the strict
    // >; seg3's 320 sits AT q3*L=320 likewise).
    val dir = eventsDir(Map(
      "view" -> Seq(10L, 20, 30, 40, 50, 60, 70, 80, 10, 10, 10, 10,
        80, 80, 80, 80),
      "flat" -> Seq.fill(8)(50L)))
    val rows = SparkEntry.queries("q_ts_sax")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val v = rows("view")
    assert(v.getLong(1) == 16 && v.getLong(2) == 4)
    assert(v.getString(3) == "bcac")
    assert(v.getString(4) == "bca" && v.getLong(5) == 1,
      "trigrams bca/cac tie at count 1 - lexicographic tie-break")
    // Constant series: every PAA sum equals q*L exactly -> all 'a';
    // 2 segments -> no trigram -> null motif.
    val f = rows("flat")
    assert(f.getLong(1) == 8 && f.getLong(2) == 2)
    assert(f.getString(3) == "aa")
    assert(f.isNullAt(4) && f.isNullAt(5))
  }

  test("registry corpus: word length == ceil(n_days/4), symbols in a..d") {
    val rows = SparkEntry.queries("q_ts_sax")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDays, nSeg, word) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(nSeg == (nDays + 3) / 4)
      assert(word.length == nSeg)
      assert(word.forall(c => c >= 'a' && c <= 'd'))
    }
  }
}
