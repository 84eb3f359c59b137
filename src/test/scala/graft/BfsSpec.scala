package graft

import graft.operators.{Bfs, Triangles}

/** Multi-source BFS: hand graphs with known hop distances, unreachable
  * components, and multi-seed minimum semantics. */
class BfsSpec extends SparkSpecBase {

  private def hops(edges: Seq[(Long, Long)], seedsMod: Long, rounds: Int) = {
    import spark.implicits._
    Bfs.hopSummary(
        Triangles.canonical(edges.toDF("a", "b"), "a", "b"), seedsMod, rounds)
      .orderBy("hop").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("path graph from one seed: one node per hop") {
    // Path 7-1-2-3-4; seedsMod 7 seeds exactly node 7 (and nothing else
    // since no other node is a multiple of 7).
    val out = hops(Seq((7L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)),
      seedsMod = 7, rounds = 4)
    assert(out.toSeq == Seq((0L, 1L, 7L), (1L, 1L, 1L), (2L, 1L, 2L),
      (3L, 1L, 3L), (4L, 1L, 4L)))
  }

  test("disconnected component is never reached; frontier goes empty") {
    val out = hops(Seq((7L, 1L), (2L, 3L)), seedsMod = 7, rounds = 3)
    assert(out.toSeq == Seq((0L, 1L, 7L), (1L, 1L, 1L), (2L, 0L, 0L),
      (3L, 0L, 0L)), "hop 2+ empty; nodes 2,3 unreachable")
  }

  test("two seeds expand as one multi-source pass with min-hop semantics") {
    // Path 7-1-2-3-14: seeds {7, 14} at both ends; node 2 is hop 2 from
    // BOTH — it must appear once, at its minimum hop.
    val out = hops(Seq((7L, 1L), (1L, 2L), (2L, 3L), (3L, 14L)),
      seedsMod = 7, rounds = 3)
    assert(out.toSeq == Seq((0L, 2L, 21L), (1L, 2L, 4L), (2L, 1L, 2L),
      (3L, 0L, 0L)))
  }

  test("star from the hub reaches every leaf in one hop") {
    val star = (1L to 6L).map(i => (7L, i))
    val out = hops(star, seedsMod = 7, rounds = 2)
    assert(out.toSeq == Seq((0L, 1L, 7L), (1L, 6L, 21L), (2L, 0L, 0L)))
  }
}
