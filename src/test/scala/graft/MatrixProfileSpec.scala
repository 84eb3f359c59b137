package graft

import java.nio.file.Files

/** Round-15 pins for q_ts_matrix_profile: full-output equality against an
  * in-test brute-force replica (L1, exclusion |i−j| ≥ 4, min-(d,j) ties),
  * the planted-motif zero read (an exactly repeated week), the discord
  * read (a spike week maximizes the profile), and calendar zero-fill (a
  * purchase-free interior day participates as v = 0). */
class MatrixProfileSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  /** One purchase of `dollars(d)` per listed day; absent interior days are
    * zero-filled by the query's calendar. */
  private def seriesDir(dollars: Map[Int, Double]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mp").toString
    dollars.toSeq.sortBy(_._1).zipWithIndex
      .map { case ((d, v), n) =>
        (n.toLong, d.toLong * dayNs + 7, 1L, "purchase", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  /** The query's documented contract, replayed naively. */
  private def brute(vals: IndexedSeq[Long]): Seq[(Long, Long, Long)] = {
    val is = 0 to (vals.size - 7)
    is.flatMap { i =>
      val cands = is.filter(j => math.abs(i - j) >= 4).map { j =>
        ((0 until 7).map(k => math.abs(vals(i + k) - vals(j + k))).sum, j)
      }
      if (cands.isEmpty) None
      else Some((i.toLong, cands.min._2.toLong, cands.min._1.toLong))
    }
  }

  private def run(dollars: Map[Int, Double]): Seq[(Long, Long, Long)] =
    SparkEntry.queries("q_ts_matrix_profile")(spark, seriesDir(dollars))
      .collect()
      .map(r => (r.getAs[Long]("i"), r.getAs[Long]("nn_idx"),
        r.getAs[Long]("nn_dist_l1"))).toSeq

  test("exactly repeated week reads a zero profile at the twin offsets") {
    // Days 0..13 carry the same weekly shape twice; day 2 of each week is
    // purchase-free (zero-fill exercised inside the subsequences).
    val week = Map(0 -> 5.0, 1 -> 3.0, 3 -> 8.0, 4 -> 1.0, 5 -> 4.0, 6 -> 9.0)
    val dollars = week ++ week.map { case (d, v) => (d + 7, v) }
    val got = run(dollars)
    val vals = (0 to 13).map(d =>
      dollars.get(d).map(v => (v * 100).round).getOrElse(0L))
    assert(got == brute(vals), "full profile == brute-force replica")
    assert(got.head == (0L, 7L, 0L), "i=0 finds its exact twin at j=7")
    assert(got.last == (7L, 0L, 0L), "i=7 finds its exact twin at j=0")
  }

  test("a spike week is the discord (profile argmax overlaps the spike)") {
    val flat = (0 to 20).map(d => d -> 2.0).toMap
    val dollars = flat + (10 -> 500.0)
    val got = run(dollars)
    val vals = (0 to 20).map(d => (dollars(d) * 100).round)
    assert(got == brute(vals), "full profile == brute-force replica")
    val discord = got.maxBy(_._3)
    assert(discord._1 >= 4 && discord._1 <= 10,
      "the max-profile subsequence must overlap the spike day 10")
    // Far-from-spike subsequences pair with other flat windows at dist 0.
    assert(got.find(_._1 == 0L).get._3 == 0L)
  }

  test("series shorter than 11 days yields no admissible pairs") {
    val got = run((0 to 9).map(d => d -> 1.0).toMap)
    // n=10 → starts i ∈ {0..3}; |i−j| ≥ 4 with both ends in {0..3} is
    // unsatisfiable, so every subsequence drops out.
    assert(got.isEmpty, "no subsequence has a non-trivial neighbor")
  }
}
