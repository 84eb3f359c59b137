package graft

import graft.operators.Closeness

/** Harmonic closeness: hand-computed chains and seed pairs (every
  * micro-unit recomputed by hand), round-cutoff behavior, and the
  * parameter guard. */
class ClosenessSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], seedsMod: Long, rounds: Int) = {
    import spark.implicits._
    val canon = graft.operators.Triangles.canonical(
      edges.toDF("a", "b"), "a", "b")
    Closeness.harmonicSummary(canon, seedsMod, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("chain 10-11-12-13 from seed 10: 1/1 + 1/2 + 1/3 in micro-units") {
    // dist 1 → 1000000, dist 2 → 500000, dist 3 → 333333 (truncated).
    val out = run(Seq((10L, 11L), (11L, 12L), (12L, 13L)),
      seedsMod = 10, rounds = 3)
    assert(out == Seq((10L, 3L, 1833333L)))
  }

  test("round cutoff: rounds=1 sees only the direct neighbor") {
    val out = run(Seq((10L, 11L), (11L, 12L), (12L, 13L)),
      seedsMod = 10, rounds = 1)
    assert(out == Seq((10L, 1L, 1000000L)))
  }

  test("two seeds traverse in one pass and score symmetrically") {
    // 10 - 1 - 20: each seed reaches the middle at hop 1, the other
    // seed at hop 2 → 1000000 + 500000.
    val out = run(Seq((10L, 1L), (1L, 20L)), seedsMod = 10, rounds = 2)
    assert(out == Seq((10L, 2L, 1500000L), (20L, 2L, 1500000L)))
  }

  test("shortest distance wins when paths tie") {
    // Triangle 10-11-12 plus tail 12-13: from 10, both 11 and 12 are
    // hop 1 (the 10-11-12 two-hop path never fires), 13 is hop 2.
    val out = run(Seq((10L, 11L), (10L, 12L), (11L, 12L), (12L, 13L)),
      seedsMod = 10, rounds = 3)
    assert(out == Seq((10L, 3L, 2500000L)))
  }

  test("rounds must be positive") {
    intercept[IllegalArgumentException] {
      run(Seq((10L, 11L)), seedsMod = 10, rounds = 0)
    }
  }

  test("seed count past maxSeeds fails loud instead of building an " +
      "unbounded driver accumulator") {
    import spark.implicits._
    val canon = graft.operators.Triangles.canonical(
      (0L until 9L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b")
    // mod 1 → 10 seeds; bound of 4 must reject, and the error must name
    // the knob so misuse on a huge graph is self-diagnosing. The eager
    // driver-side require guards the DISTRIBUTED path's driver-resident
    // accumulator (the SmallGraph kernel has none; it enforces the same
    // bound inside the task — second intercept).
    spark.conf.set("graft.graph.smallKernel", "false")
    val ex = try intercept[IllegalArgumentException] {
      Closeness.harmonicSummary(canon, seedsMod = 1, rounds = 1,
        maxSeeds = 4)
    } finally spark.conf.unset("graft.graph.smallKernel")
    assert(ex.getMessage.contains("maxSeeds"))
    val exK = intercept[Exception] {
      Closeness.harmonicSummary(canon, seedsMod = 1, rounds = 1,
        maxSeeds = 4).count()
    }
    assert(exK.getMessage.contains("maxSeeds"))
    // At the bound exactly, the run proceeds.
    assert(Closeness.harmonicSummary(canon, seedsMod = 1, rounds = 1,
      maxSeeds = 10).count() == 10)
  }

  test("seed sets wider than one 63-bit mask word chunk correctly") {
    // 80-node path, EVERY node a seed (mod 1) -> two mask chunks. Check
    // all 80 rows against a plain-Scala BFS reference.
    val n = 80
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val out = run(edges, seedsMod = 1, rounds = 3).toMap2
    def ref(s: Long): (Long, Long) = {
      val ds = (0L until n.toLong)
        .map(v => math.abs(v - s)).filter(d => d >= 1 && d <= 3)
      (ds.size.toLong, ds.map(d => 1000000L / d).sum)
    }
    (0L until n.toLong).foreach { s =>
      assert(out(s) == ref(s), s"seed $s drifted")
    }
  }

  private implicit class Rows(rows: Seq[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
