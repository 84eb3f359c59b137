package graft

import graft.operators.Anf

/** Hand-computed ANF pins: the per-round reach is the POPCOUNT over
  * the new frontier (one reach per seed bit, not one per node row),
  * the cumulative/frac surfaces are integer, and the effective
  * diameter is the first radius holding >= 90% of the horizon mass. */
class AnfSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    Anf.profile(edges.toDF("lo", "hi"), seedsMod = 5L, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  test("shared middle node counts once PER SEED (popcount, not rows); " +
      "effective diameter lands before the horizon") {
    // 0-2-5, seeds {0, 5}: round 1 reaches node 2 from BOTH seeds (one
    // frontier row, two mask bits -> 2), round 2 the opposite ends.
    assert(run(Seq((0L, 2L), (2L, 5L))) == Seq(
      (1L, 2L, 2L, 500000L, 2L),
      (2L, 2L, 4L, 1000000L, 2L),
      (3L, 0L, 4L, 1000000L, 2L)))
  }

  test("two-seed path fills linearly; 90% mass needs the full horizon") {
    // 0-1-2-3-4-5, seeds {0, 5}: each round reaches one new node per
    // seed; cum 2/4/6 -> frac 333333/666666/10^6, eff_diam 3.
    assert(run(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))) == Seq(
      (1L, 2L, 2L, 333333L, 3L),
      (2L, 2L, 4L, 666666L, 3L),
      (3L, 2L, 6L, 1000000L, 3L)))
  }
}
