package graft

import graft.operators.{KCore, Triangles}

/** k-core peeling: hand graphs with known cores, cascade behavior, and
  * fixpoint within the unroll. */
class KCoreSpec extends SparkSpecBase {

  private def peel(edges: Seq[(Long, Long)], k: Int, rounds: Int) = {
    import spark.implicits._
    KCore.peelSummary(
        Triangles.canonical(edges.toDF("a", "b"), "a", "b"), k, rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("triangle with a tail: 2-core is the triangle") {
    val out = peel(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)),
      k = 2, rounds = 3)
    assert(out.head == (0L, 5L, 5L))
    assert(out.last == (3L, 3L, 3L), "fixpoint = the triangle")
    assert((out(2)._2, out(2)._3) == (out(3)._2, out(3)._3),
      "converged within the unroll")
  }

  test("a long chain cascades: each peel removes both endpoints") {
    // Path 1-2-3-4-5-6: round 1 drops nodes 1 and 6, round 2 drops 2 and
    // 5, round 3 empties — the cascade k-core peeling must follow.
    val path = (1L until 6L).map(i => (i, i + 1))
    val out = peel(path, k = 2, rounds = 3)
    assert(out.map(t => t._2).toSeq == Seq(6L, 4L, 2L, 0L))
  }

  test("a clique survives peeling below its degree") {
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val out = peel(k5, k = 4, rounds = 2)
    assert(out.forall { case (_, n, e) => n == 5 && e == 10 })
  }
}
