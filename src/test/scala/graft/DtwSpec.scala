package graft

import java.nio.file.Files

/** Wave-20 pins: banded DTW between event-type daily profiles — a
  * phase-shifted pair the band can realign (dtw < l1, hand-traced), an
  * identical pair (dtw = 0), and the dtw ≤ l1 invariant on real data. */
class DtwSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** One event per (type, phase) occurrence — counts become the profile. */
  private def eventsDir(profile: Map[String, Seq[Long]]): String = {
    import spark.implicits._
    val rows = for {
      (ty, counts) <- profile.toSeq
      (c, ph) <- counts.zipWithIndex
      k <- 0L until c
    } yield (ty, ph.toLong, k)
    val dir = Files.createTempDirectory("graft-dtw").toString
    rows.zipWithIndex.map { case ((ty, ph, k), i) =>
      (i.toLong, ph * dayNs + k, 1L, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("identical profiles give dtw = 0, shifted profiles realign") {
    // 'a' and 'b': identical spike trains → dtw 0, l1 0, gain 0.
    // 'a' vs 'c': the same spikes shifted by one day — l1 pays the full
    // double-spike cost, the band realigns all but the boundary cells.
    val spike = Seq.tabulate(31)(i => if (i % 7 == 3) 5L else 1L)
    val shifted = Seq.tabulate(31)(i =>
      if (i == 0) 1L else spike(i - 1))
    val dir = eventsDir(Map("a" -> spike, "b" -> spike, "c" -> shifted))
    val got = SparkEntry.queries("q_ts_dtw")(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "b")) == (0L, 0L, 0L), "identical twins")
    val (dtwAc, l1Ac, gainAc) = got(("a", "c"))
    // Hand trace: path (0,0) → right (0,1) → diagonals (i, i+1) → down
    // (30,30). Every traversed cell costs |1−1| or |5−5| = 0, so the
    // one-day shift realigns PERFECTLY; l1 pays the double-spike cost
    // at the 8 displaced positions: 8 × |5−1| = 32.
    assert(dtwAc == 0L, "band absorbs the one-day shift completely")
    assert(l1Ac == 32L, "no-warp diagonal pays 8 displaced spikes")
    assert(gainAc == 10000L, "full realignment gain")
  }

  test("dtw <= l1 on every real pair at sf0.001 (band contains diagonal)") {
    val got = SparkEntry.queries("q_ts_dtw")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.length == 10, "5 types -> 10 ordered pairs")
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"${r.getString(0)}/${r.getString(1)}: dtw must not exceed l1")
      assert(r.getLong(4) >= 0L)
    }
  }
}
