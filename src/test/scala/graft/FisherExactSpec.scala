package graft

import java.nio.file.Files

/** Wave-16 pins: exact two-sided Fisher test — the textbook 4/4-margin
  * table (lady-tasting-tea layout) must reproduce p = 34/70, and a
  * degenerate all-early table must collapse to p = 1 with the odds
  * sentinel. */
class FisherExactSpec extends SparkSpecBase {

  private val hourNs = 3600L * 1000 * 1000 * 1000
  private val dayNs = 24L * hourNs

  private def eventsDir(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fisher").toString
    rows.zipWithIndex.map { case ((ph, hour), i) =>
      (i.toLong, ph * dayNs + hour * hourNs, 1L, "t", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("tea-tasting 2x2 [[3,1],[1,3]] yields the exact 34/70 two-sided p") {
    // early phases 0-3 (ph < 16), late 16-19; am-majority via hour 1 vs 13.
    // a=3 (0,1,2 am-major early), b=1 (3 pm), c=1 (16 am late), d=3.
    val rows = Seq((0L, 1L), (1L, 1L), (2L, 1L), (3L, 13L),
      (16L, 1L), (17L, 13L), (18L, 13L), (19L, 13L))
    val r = SparkEntry.queries("q_stats_fisher_exact")(
      spark, eventsDir(rows)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (3L, 1L, 1L, 3L), "cells")
    assert(r.getLong(5) == 34L, "num: x in {0,1,3,4} weigh 1+16+16+1")
    assert(r.getLong(6) == 70L, "den = C(8,4) by Vandermonde")
    assert(r.getLong(7) == 485714L, "p6 = floor(34/70 * 1e6)")
    assert(r.getLong(8) == 90000L, "OR = 3*3/(1*1) = 9.0 in 1e-4")
  }

  test("independence-shaped table keeps a high p (balanced margins)") {
    // a=2,b=2,c=2,d=2 → every support weight pattern is symmetric,
    // two-sided p = 1 exactly (all weights <= w(a) since a is modal).
    val rows = Seq((0L, 1L), (1L, 1L), (2L, 13L), (3L, 13L),
      (16L, 1L), (17L, 1L), (18L, 13L), (19L, 13L))
    val r = SparkEntry.queries("q_stats_fisher_exact")(
      spark, eventsDir(rows)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (2L, 2L, 2L, 2L))
    assert(r.getLong(5) == r.getLong(6), "modal cell: num == den")
    assert(r.getLong(7) == 1000000L, "p = 1")
    assert(r.getLong(8) == 10000L, "OR = 1.0")
  }

  test("degenerate all-early universe collapses to p = 1 and OR sentinel") {
    val rows = Seq((0L, 1L), (1L, 1L))
    val r = SparkEntry.queries("q_stats_fisher_exact")(
      spark, eventsDir(rows)).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (2L, 0L, 0L, 0L))
    assert(r.getLong(7) == 1000000L, "single support point")
    assert(r.getLong(8) == -1L, "zero off-diagonal product → sentinel")
  }
}
