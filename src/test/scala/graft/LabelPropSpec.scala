package graft

import graft.operators.{LabelProp, Triangles}

/** Synchronous label propagation: hand-walked rounds on known graphs
  * (every label argmax recomputed by hand), plus the bipartite
  * oscillation the per-round summary is designed to make visible. */
class LabelPropSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], rounds: Int) = {
    import spark.implicits._
    LabelProp.propagateSummary(
        Triangles.canonical(edges.toDF("a", "b"), "a", "b"), rounds)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("two triangles over a bridge converge to the two communities") {
    // Triangles {1,2,3} and {4,5,6} bridged by 3-4. Hand-walked sync
    // rounds (most-frequent neighbor label, ties -> min):
    //   l1: 1->2 2->1 3->1 4->3 5->4 6->4   (4 communities, largest 2)
    //   l2: 1->1 2->1 3->1 4->4 5->3 6->3   (3 communities, largest 3)
    //   l3: 1->1 2->1 3->1 4->3 5->3 6->3   (2 communities, largest 3)
    val out = run(Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)), rounds = 3)
    assert(out(0) == (0L, 6L, 1L), "round 0 is all singletons")
    assert(out(1) == (1L, 4L, 2L))
    assert(out(2) == (2L, 3L, 3L))
    assert(out(3) == (3L, 2L, 3L), "the two triangles emerge")
  }

  test("a star oscillates between center-led and leaf-led labelings") {
    // K1,4 is bipartite: round 1 sends the center to the min leaf label
    // and every leaf to the center's, round 2 swaps them back — the
    // documented sync-LPA oscillation, visible in the unchanged summary.
    val star = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val out = run(star, rounds = 2)
    assert(out(0) == (0L, 5L, 1L))
    assert(out(1) == (1L, 2L, 4L), "leaves adopt the center's label")
    assert(out(2) == (2L, 2L, 4L), "swap preserves the summary shape")
  }

  test("disconnected cliques never merge") {
    val k3a = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val k3b = Seq((7L, 8L), (8L, 9L), (7L, 9L))
    val out = run(k3a ++ k3b, rounds = 2)
    assert(out.last._2 == 2L, "one community per clique")
    assert(out.last._3 == 3L)
  }

  test("shuffle-join fallback (broadcast gate off) gives identical rounds") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val canon = Triangles.canonical(edges.toDF("a", "b"), "a", "b")
    val bcast = LabelProp.propagateSummary(canon, rounds = 3)
      .orderBy("round").collect().map(_.toSeq)
    val shuffled = LabelProp
      .propagateSummary(canon, rounds = 3, broadcastMaxLabels = 0L)
      .orderBy("round").collect().map(_.toSeq)
    assert(bcast.toSeq == shuffled.toSeq,
      "the gate changes the plan, never the labels")
  }

  test("oracle CTEs replay the same rounds (text sanity)") {
    val sql = LabelProp.oracleCtes("SELECT 1 AS lo, 2 AS hi", rounds = 2)
    assert(sql.contains("l0 AS MATERIALIZED"))
    assert(sql.contains("c2 AS MATERIALIZED"))
    assert(sql.contains("summary AS"))
    assert(!sql.contains("l3 "), "unroll depth matches the request")
  }
  test("finalLabels: converged assignment matches the summary's story") {
    import spark.implicits._
    // Two disjoint triangles: after 3 rounds each collapses to its min
    // label (hand-walked: round 1 mixes via min-ties, round 2 settles).
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val l = LabelProp.finalLabels(
        Triangles.canonical(edges.toDF("a", "b"), "a", "b"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(l.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(l(1L), l(2L), l(3L)).size == 1, s"left clique uniform: $l")
    assert(Set(l(10L), l(11L), l(12L)).size == 1, s"right clique uniform: $l")
    assert(l(1L) != l(10L), "cliques keep distinct communities")
  }
}
