package graft

import graft.operators.{KTruss, Triangles}

/** k-truss peeling: hand graphs with known trusses, the support-cascade
  * behavior that distinguishes truss from core, and fixpoint witness. */
class KTrussSpec extends SparkSpecBase {

  private def truss(edges: Seq[(Long, Long)], k: Int, rounds: Int) = {
    import spark.implicits._
    KTruss.trussSummary(
        Triangles.canonical(edges.toDF("a", "b"), "a", "b"), k, rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  private def k4(offset: Long): Seq[(Long, Long)] =
    (for { i <- 0 until 4; j <- i + 1 until 4 }
      yield (offset + i, offset + j)).toSeq

  test("K4 with a pendant triangle: the 4-truss is exactly the K4") {
    // K4 on {1,2,3,4} (every edge in 2 triangles) plus a triangle
    // {4,5,6} hanging off node 4 (each of its edges in only 1).
    val g = k4(1L) ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val out = truss(g, k = 4, rounds = 3)
    assert(out.head == (0L, 6L, 9L))
    assert(out.last == (3L, 4L, 6L), "fixpoint = the K4")
    assert((out(2)._2, out(2)._3) == (out(3)._2, out(3)._3),
      "converged within the unroll")
  }

  test("truss peeling cascades where core peeling would not") {
    // Two K4s sharing one BRIDGE edge (7,8) that sits in no triangle:
    // round 1 deletes only the bridge (its support is 0), and both K4s
    // survive untouched — min degree 3 everywhere, so 4-CORE peeling
    // would never remove the bridge's endpoints. Edge-level support is
    // what isolates it.
    val g = k4(5L) ++ k4(9L) ++ Seq((8L, 9L))
    val out = truss(g, k = 4, rounds = 2)
    assert(out(0)._3 == 13L)
    assert(out(1) == (1L, 8L, 12L), "only the bridge edge dies")
    assert(out(2) == (2L, 8L, 12L), "both K4s are 4-trusses")
  }

  test("a bare triangle survives k=3 but dies at k=4") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    assert(truss(tri, k = 3, rounds = 2).last == (2L, 3L, 3L))
    assert(truss(tri, k = 4, rounds = 2).last == (2L, 0L, 0L))
  }

  test("containment law on seeded random graphs: the 4-truss sits inside " +
      "the 3-core") {
    // Theory: every node of a k-truss has ≥ k−1 truss-internal neighbors,
    // so the k-truss is a subgraph of the (k−1)-core. Subgraph ⇒ both
    // counts are bounded by the core's — check it on seeded random graphs
    // (deterministic: fixed seeds).
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(220) {
        val a = rnd.nextInt(36).toLong; val b = rnd.nextInt(36).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val trussFix = truss(edges, k = 4, rounds = 6).last
      val coreFix = {
        import spark.implicits._
        graft.operators.KCore.peelSummary(
            Triangles.canonical(edges.toDF("a", "b"), "a", "b"),
            k = 3, rounds = 8)
          .orderBy("round").collect().last
      }
      assert(trussFix._2 <= coreFix.getLong(1),
        s"seed $seed: truss nodes ${trussFix._2} > core nodes")
      assert(trussFix._3 <= coreFix.getLong(2),
        s"seed $seed: truss edges ${trussFix._3} > core edges")
    }
  }

  test("oracle CTEs unroll to the requested depth") {
    val sql = KTruss.oracleCtes("SELECT 1 AS lo, 2 AS hi", k = 4, rounds = 2)
    assert(sql.contains("t1 AS MATERIALIZED"))
    assert(sql.contains("e2 AS MATERIALIZED"))
    assert(sql.contains("sup >= 2"))
    assert(!sql.contains("t3 "))
  }
}
