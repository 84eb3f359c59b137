package graft

import graft.operators.Ppr

/** Personalized PageRank: exact parity with an independent driver-side
  * reference implementing the same unit recursion, zero rank off the
  * seed component, and seed-proximity ordering. */
class PprSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], seeds: Set[Long],
                  iters: Int): Map[Long, Double] = {
    import spark.implicits._
    val sym = edges ++ edges.map(_.swap)
    Ppr.run(sym.toDF("src", "dst"), "src", "dst",
        isSeed = n => n.isin(seeds.toSeq.map(Long.box): _*),
        iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  /** Plain-Scala reference of the identical recursion (floored picorank
    * units, per-node base, 9 dp surface rounding). */
  private def reference(edges: Seq[(Long, Long)], seeds: Set[Long],
                        iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val out = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val outdeg = out.view.mapValues(_.size).toMap
    val nS = seeds.count(nodes.contains)
    def base(v: Long) = if (seeds(v)) (1.0 - d) / nS else 0.0
    var rank = nodes.map(v =>
      v -> (if (seeds(v)) 1.0 / nS else 0.0)).toMap
    for (_ <- 1 to iters) {
      val units = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      for (v <- nodes; w <- out.getOrElse(v, Nil))
        units(w) += math.floor(rank(v) / outdeg(v) * 1e12 + 0.5).toLong
      rank = nodes.map(v => v -> (base(v) + d * (units(v) / 1e12))).toMap
    }
    rank.map { case (v, r) => v -> math.floor(r * 1e9 + 0.5) / 1e9 }
  }

  // Path 1-2-3-4-5 plus a disconnected triangle {10,11,12}.
  private val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
    (10L, 11L), (11L, 12L), (10L, 12L))

  test("bit-exact parity with the plain-Scala unit recursion") {
    val got = run(g, seeds = Set(1L), iters = 6)
    val want = reference(g, seeds = Set(1L), iters = 6)
    assert(got == want)
  }

  test("mass never reaches a component without seeds") {
    val got = run(g, seeds = Set(1L), iters = 6)
    assert(Seq(10L, 11L, 12L).forall(got(_) == 0.0),
      "disconnected triangle must hold rank exactly 0")
    assert(got(2L) > 0.0)
  }

  test("relevance decays with distance from the seed") {
    val got = run(g, seeds = Set(1L), iters = 10)
    assert(got(2L) > got(3L) && got(3L) > got(4L),
      s"path ranks must decay away from the seed: $got")
  }

  test("multi-seed: symmetric seeds give symmetric ranks") {
    val got = run(g, seeds = Set(1L, 5L), iters = 8)
    assert(got(1L) == got(5L) && got(2L) == got(4L),
      s"mirror symmetry of the path with both endpoints seeded: $got")
  }
}
