package graft

import java.nio.file.Files

/** Round-15 pin for the Hodges–Lehmann pseudomedian
  * (q_stats_hodges_lehmann): the textbook worked example {1, 2, 6} —
  * Walsh averages {1, 1.5, 2, 3.5, 4, 6}, pseudomedian (2+3.5)/2 =
  * 2.75 — plus the robustness law that separates HL from the mean. */
class HodgesLehmannSpec extends SparkSpecBase {

  private val DAY = 86400L * 1000 * 1000 * 1000

  private def run(xs: Seq[Long]): (Long, Long, Long, Long) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hl").toString
    // Day d carries cent-sum xs(d): one event of value xs(d)/100.
    xs.zipWithIndex.map { case (x, d) =>
      (d.toLong, d * DAY, "t", x / 100.0)
    }.toDF("event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q_stats_hodges_lehmann")(spark, dir)
      .collect()
    assert(r.length == 1)
    (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
  }

  test("textbook {1,2,6}: pseudomedian 2.75") {
    // Daily cent sums {100, 200, 600}. Walsh sums: 200, 300, 400, 700,
    // 800, 1200; m=6 -> lo = rank3 = 400, hi = rank4 = 700; hl_milli =
    // (400+700)*250 = 275000 milli-cents = 275 cents — the textbook
    // pseudomedian 2.75 (dollars) of {1, 2, 6}.
    assert(run(Seq(100L, 200L, 600L)) == ((6L, 400L, 700L, 275000L)))
  }

  test("odd pair count: lo == hi at the exact middle") {
    // {100, 300}: Walsh sums 200, 400, 600; m=3 -> lo=hi=rank2=400.
    assert(run(Seq(100L, 300L)) == ((3L, 400L, 400L, 200000L)))
  }

  test("robustness: one wild outlier moves HL far less than the mean") {
    val (_, _, _, clean) = run(Seq(100L, 110L, 120L, 130L, 140L))
    val (_, _, _, dirty) = run(Seq(100L, 110L, 120L, 130L, 99900L))
    // Mean jumps by ~19956 cents; the pseudomedian stays within the
    // clean sample's range (its breakdown point is ~29%).
    assert(math.abs(dirty - clean) < 100L * 1000,
      s"HL moved ${math.abs(dirty - clean)} milli-cents on one outlier")
  }
}
