package graft

import graft.operators.{PageRank, WeightedPageRank}

/** Weighted PageRank: the w ≡ 1 degeneration must be BIT-identical to
  * unweighted PageRank, weight must steer rank, and parallel edges must
  * sum-collapse. */
class WeightedPageRankSpec extends SparkSpecBase {

  private def runW(edges: Seq[(Long, Long, Long)], iters: Int) = {
    import spark.implicits._
    WeightedPageRank.run(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iterations = iters)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
  }

  test("w = 1 everywhere reproduces unweighted PageRank bit for bit") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val unweighted = PageRank.run(edges.toDF("src", "dst"), "src", "dst",
        iterations = 5)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(runW(edges.map { case (a, b) => (a, b, 1L) }, 5) == unweighted)
  }

  test("heavier edges carry more rank: weighted beats unweighted target") {
    // Hub 0 links to 1 with weight 9 and to 2 with weight 1: node 1 must
    // outrank node 2 (same in-degree, different weight share).
    val out = runW(Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L),
      (2L, 0L, 1L)), 8).toMap
    assert(out(1L) > out(2L), s"weight steers rank: $out")
  }

  test("parallel edges collapse by summing weight") {
    // (0->1, 3) + (0->1, 6) must equal a single (0->1, 9).
    val split = runW(Seq((0L, 1L, 3L), (0L, 1L, 6L), (0L, 2L, 1L),
      (1L, 0L, 1L), (2L, 0L, 1L)), 6)
    val merged = runW(Seq((0L, 1L, 9L), (0L, 2L, 1L),
      (1L, 0L, 1L), (2L, 0L, 1L)), 6)
    assert(split == merged)
  }

  test("deterministic across row order") {
    val g = Seq((0L, 1L, 2L), (1L, 2L, 3L), (2L, 0L, 5L), (0L, 2L, 1L))
    assert(runW(g, 7) == runW(g.reverse, 7))
  }

  test("oracle CTEs unroll to the requested depth, weights in the sum") {
    val sql = WeightedPageRank.oracleCtes("SELECT 1 AS src, 2 AS dst, 3 AS w",
      iterations = 4)
    assert(sql.contains("r4 AS"))
    assert(!sql.contains("r5 AS"))
    assert(sql.contains("r.rank * e.w / wdeg.wdeg"))
  }
}
