package graft

import java.nio.file.Files

/** Hand-derived pins for the exact sign test + Benjamini–Hochberg layer:
  * three constructed event types — all-positive (p = 2/2¹⁰, BH-rejected
  * at rank 1), balanced (p capped at 1), and all-ties (n = 0 → p = 1) —
  * with every integer (pn, den, p6, rank, reject) computed by hand. */
class SignBhSpec extends SparkSpecBase {

  test("sign test + BH: constructed asymmetries match hand arithmetic") {
    import spark.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    def ev(t: String, day: Long, hour: Long, copies: Int) =
      (0 until copies).map(_ => (t, day * dayNs + hour * hourNs))
    val rows =
      // x: 10 phases, each 2 morning vs 1 evening → k=10, n=10,
      //    p = 2·C(10,0)/2¹⁰ = 2/1024
      (0L to 9L).flatMap(d => ev("x", d, 1, 2) ++ ev("x", d, 13, 1)) ++
      // y: 5 positive + 5 negative phases → k=5, n=10, p capped at 1
      (0L to 4L).flatMap(d => ev("y", d, 1, 2) ++ ev("y", d, 13, 1)) ++
      (5L to 9L).flatMap(d => ev("y", d, 1, 1) ++ ev("y", d, 13, 2)) ++
      // z: 3 phases, exact ties → dropped entirely, n=0, p=1
      (0L to 2L).flatMap(d => ev("z", d, 1, 1) ++ ev("z", d, 13, 1))
    val dir = Files.createTempDirectory("graft-signbh").toString
    rows.zipWithIndex.map { case ((t, ts), i) => (i.toLong, ts, 1L, t) }
      .toDF("event_id", "ts", "user_id", "event_type")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_stats_sign_bh")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    // p6: 2/1024 → ⌊0.001953125·10⁶⌋ = 1953. BH at α=.05, M=3: rank-1
    // condition 60·p_scaled ≤ 2³¹ holds only for x.
    assert(got.toSeq == Seq(
      ("x", 10L, 10L, 2L, 1024L, 1953L, 1L, 1L),
      ("y", 10L, 5L, 1024L, 1024L, 1000000L, 2L, 0L),
      ("z", 0L, 0L, 1L, 1L, 1000000L, 3L, 0L)))
  }
}
