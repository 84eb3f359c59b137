package graft

import graft.operators.Betweenness

/** Hand-computed Brandes pins — the DuckDB oracle replays the same
  * two-phase accumulation, so these fixtures pin the DEFINITIONS:
  * path-count splitting (σ > 1 divides dependency), per-seed
  * accumulation, seed exclusion, and the horizon cut. */
class BetweennessSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], seedsMod: Long) = {
    import spark.implicits._
    Betweenness.topK(edges.toDF("lo", "hi"), seedsMod, rounds = 3, k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("diamond: two equal shortest paths split the dependency in half") {
    // 0-1, 0-2, 1-3, 2-3; seed {0}. sigma(3) = 2, so delta(1) =
    // delta(2) = floor(1*(10^6+0)/2) = 500000; the sink carries 0.
    val out = run(Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L)), 5L)
    assert(out == Seq((1L, 500000L), (2L, 500000L), (3L, 0L)))
  }

  test("path with two seeds: dependencies accumulate per seed and the " +
      "horizon cuts unreached nodes") {
    // 0-1-2-3-4-5; seeds {0, 5}, horizon 3. From 0: delta(1) = 2e6,
    // delta(2) = 1e6, delta(3) = 0, node 4 unreached. From 5 mirrored.
    val out = run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 5L)
    assert(out == Seq((1L, 2000000L), (4L, 2000000L),
      (2L, 1000000L), (3L, 1000000L)))
  }
}
