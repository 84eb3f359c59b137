package graft

import graft.operators.Eccentricity

/** Eccentricity: hand-computed chains and stars (every hop counted by
  * hand), horizon cutoff, and the parameter guards — the bit-parallel
  * sibling of [[ClosenessSpec]] with max-hop instead of harmonic
  * accumulation. */
class EccentricitySpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], seedsMod: Long, rounds: Int) = {
    import spark.implicits._
    val canon = graft.operators.Triangles.canonical(
      edges.toDF("a", "b"), "a", "b")
    Eccentricity.summary(canon, seedsMod, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("chain 10-11-12-13 from seed 10: ecc 3, reaches 3 nodes") {
    val out = run(Seq((10L, 11L), (11L, 12L), (12L, 13L)),
      seedsMod = 10, rounds = 4)
    assert(out == Seq((10L, 3L, 3L)))
  }

  test("horizon cutoff: rounds=2 caps ecc at 2 (a lower bound)") {
    val out = run(Seq((10L, 11L), (11L, 12L), (12L, 13L)),
      seedsMod = 10, rounds = 2)
    assert(out == Seq((10L, 2L, 2L)))
  }

  test("star center has ecc 1, leaves have ecc 2") {
    // 1 is the hub; 10 and 20 are seed leaves (mod 10).
    val out = run(Seq((1L, 10L), (1L, 20L), (1L, 3L)),
      seedsMod = 10, rounds = 3)
    assert(out == Seq((10L, 2L, 3L), (20L, 2L, 3L)))
  }

  test("exhausted component stops raising ecc before the horizon") {
    // Triangle 10-11-12: everything is hop 1 from 10 — ecc stays 1
    // even with 3 rounds of budget.
    val out = run(Seq((10L, 11L), (10L, 12L), (11L, 12L)),
      seedsMod = 10, rounds = 3)
    assert(out == Seq((10L, 1L, 2L)))
  }

  test("rounds must be positive") {
    intercept[IllegalArgumentException] {
      run(Seq((10L, 11L)), seedsMod = 10, rounds = 0)
    }
  }

  test("seed count past maxSeeds fails loud") {
    import spark.implicits._
    val canon = graft.operators.Triangles.canonical(
      (0L until 9L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b")
    // Eager driver-side require on the DISTRIBUTED path (it guards the
    // driver-resident accumulator); the SmallGraph kernel has none and
    // enforces the same bound inside the task (second intercept).
    spark.conf.set("graft.graph.smallKernel", "false")
    val ex = try intercept[IllegalArgumentException] {
      Eccentricity.summary(canon, seedsMod = 1, rounds = 1, maxSeeds = 4)
    } finally spark.conf.unset("graft.graph.smallKernel")
    assert(ex.getMessage.contains("maxSeeds"))
    val exK = intercept[Exception] {
      Eccentricity.summary(canon, seedsMod = 1, rounds = 1, maxSeeds = 4)
        .count()
    }
    assert(exK.getMessage.contains("maxSeeds"))
  }

  test("seed sets wider than one 63-bit mask word chunk correctly") {
    // 70-node path, every node a seed -> two mask chunks; ecc within a
    // 3-hop horizon is min(3, max(s, 69-s)) against a scalar reference.
    val n = 70
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val out = run(edges, seedsMod = 1, rounds = 3)
      .map(r => r._1 -> (r._2, r._3)).toMap
    (0L until n.toLong).foreach { s =>
      val reach = (0L until n.toLong)
        .map(v => math.abs(v - s)).count(d => d >= 1 && d <= 3)
      val ecc = math.min(3L, math.max(s, n - 1 - s))
      assert(out(s) == ((ecc, reach.toLong)), s"seed $s drifted")
    }
  }
}
