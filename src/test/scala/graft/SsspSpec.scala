package graft

import graft.operators.Sssp

/** Bellman–Ford SSSP: hand-walked relaxations on weighted paths, the
  * weighted-vs-hop distinction BFS can't see, fixpoint witness, and
  * parallel-edge min-collapse. */
class SsspSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long, Long)], seedsMod: Long,
                  rounds: Int): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    Sssp.distanceSummary(edges.toDF("src", "dst", "w"), seedsMod, rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("hand-walked chain: distances accumulate weights, not hops") {
    // 0 -5-> 1 -2-> 2 -9-> 3, seed {0}. Round r reaches node r.
    val g = Seq((0L, 1L, 5L), (1L, 2L, 2L), (2L, 3L, 9L))
    assert(run(g, seedsMod = 100, rounds = 3) == Seq(
      (0L, 1L, 0L, 0L),        // {0:0}
      (1L, 2L, 5L, 5L),        // {0:0, 1:5}
      (2L, 3L, 12L, 7L),       // {.., 2:7}
      (3L, 4L, 28L, 16L)))     // {.., 3:16}
  }

  test("a longer-hop cheaper path wins once enough rounds relax it") {
    // 0 -10-> 2 directly, but 0 -1-> 1 -1-> 2 is cheaper with 2 hops.
    val g = Seq((0L, 2L, 10L), (0L, 1L, 1L), (1L, 2L, 1L))
    val out = run(g, seedsMod = 100, rounds = 3)
    assert(out(1) == (1L, 3L, 11L, 10L), s"after 1 round direct edge: $out")
    assert(out(2) == (2L, 3L, 3L, 2L), s"2-hop path relaxes to 2: $out")
    assert((out(3)._2, out(3)._3, out(3)._4) == (out(2)._2, out(2)._3, out(2)._4),
      "fixpoint witnessed by equal consecutive summaries")
  }

  test("parallel edges collapse to the min weight") {
    val g = Seq((0L, 1L, 7L), (0L, 1L, 3L), (0L, 1L, 9L))
    assert(run(g, seedsMod = 100, rounds = 1).last == (1L, 2L, 3L, 3L))
  }

  test("multi-seed: each node takes the cheapest seed, zero-weight seeds") {
    // Seeds {0, 100}; node 1 is 1 from seed 0 and 50 from seed 100.
    val g = Seq((0L, 1L, 1L), (100L, 1L, 50L), (100L, 101L, 2L))
    val out = run(g, seedsMod = 100, rounds = 2)
    assert(out(1) == (1L, 4L, 3L, 2L), s"seeds 0+100, dists 1 and 2: $out")
  }

  test("uniform weights degenerate to BFS hop counts") {
    import spark.implicits._
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12, 1L))
    val sym = ring ++ ring.map { case (a, b, w) => (b, a, w) }
    val out = run(sym, seedsMod = 12, rounds = 6)
    // seed {0}; after 6 rounds everything within 6 hops: whole 12-ring.
    assert(out.last._2 == 12L)
    assert(out.last._4 == 6L, s"max dist = eccentricity 6: $out")
  }

  test("oracle CTEs unroll to the requested depth") {
    val sql = Sssp.oracleCtes("SELECT 1 AS src, 2 AS dst, 3 AS w", 100, 3)
    assert(sql.contains("d3 AS MATERIALIZED"))
    assert(!sql.contains("d4 "))
    assert(sql.contains("min(w) AS w"))
  }

  test("rounds = 0 rejected") {
    assertThrows[IllegalArgumentException](run(Seq((0L, 1L, 1L)), 100, 0))
  }
}
