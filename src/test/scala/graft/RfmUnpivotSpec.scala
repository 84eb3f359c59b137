package graft

import java.nio.file.Files

/** Hand-computed fixtures for the wave-7 relational additions: RFM
  * segmentation (quintile thresholds, score inversion, segment labels)
  * and the stack()-based unpivot profile. The DuckDB oracle replays the
  * same arithmetic, so these pin the FORMULAS against by-hand values
  * (the NextFitSpec lesson: an identically-wrong pair still hash-matches).
  */
class RfmUnpivotSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("RFM: 5 known users land in the hand-computed score cells") {
    import spark.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    // (user, day, cents): u1 1 buy @day10; u2 2 buys @9,10; u3 3 @5..7;
    // u4 4 @2..5; u5 5 @1..5. Values in dollars (query converts).
    val rows = Seq(
      (1L, 10L, 1.00), (2L, 9L, 2.00), (2L, 10L, 2.00),
      (3L, 5L, 3.00), (3L, 6L, 3.00), (3L, 7L, 3.00),
      (4L, 2L, 4.00), (4L, 3L, 4.00), (4L, 4L, 4.00), (4L, 5L, 4.00),
      (5L, 1L, 5.00), (5L, 2L, 5.00), (5L, 3L, 5.00), (5L, 4L, 5.00),
      (5L, 5L, 5.00))
    val dir = tmp("graft-rfm")
    rows.zipWithIndex.map { case ((u, d, v), i) =>
      (i.toLong, d * dayNs, u, "purchase", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val got = SparkEntry.queries("q_e_rfm")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // Hand-derived (percentile positions p·(n−1) over n=5 users, floor+0.5
    // rounding): rec thresholds (0,2,4,5), freq (2,3,3,4), cents
    // (340,700,1180,1780). u1→(5,1,1,new), u2→(5,1,2,new),
    // u3→(3,2,3,regular), u4→(2,4,4,loyal), u5→(2,5,5,loyal).
    assert(got.toSeq == Seq(
      (2L, 4L, 4L, "loyal", 1L, 1600L, 1600L),
      (2L, 5L, 5L, "loyal", 1L, 2500L, 2500L),
      (3L, 2L, 3L, "regular", 1L, 900L, 900L),
      (5L, 1L, 1L, "new", 1L, 100L, 100L),
      (5L, 1L, 2L, "new", 1L, 400L, 400L)))
  }

  test("RFM: non-purchase events are invisible to the cube") {
    import spark.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val dir = tmp("graft-rfm")
    Seq((1L, 1L * dayNs, 7L, "purchase", 2.00),
      (2L, 9L * dayNs, 7L, "view", 999.00),
      (3L, 2L * dayNs, 8L, "purchase", 2.00))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_e_rfm")(spark, dir).collect()
    // Both users: freq 1, cents 200; recency u7=1 day, u8=0 (the view
    // row must not extend u7's last purchase day).
    assert(got.map(_.getLong(4)).sum == 2L)
    assert(got.forall(_.getLong(5) == 200L))
  }

  test("unpivot: 2-row lineitem melts to the 4 hand-computed profiles") {
    import spark.implicits._
    val dir = tmp("graft-unpivot")
    Seq((1.0, 10.00, 0.05, 0.08), (2.0, 20.50, 0.10, 0.00))
      .toDF("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_agg_unpivot")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("discount", 2L, 15L, 5L, 10L),
      ("extendedprice", 2L, 3050L, 1000L, 2050L),
      ("quantity", 2L, 300L, 100L, 200L),
      ("tax", 2L, 8L, 0L, 8L)))
  }
}
