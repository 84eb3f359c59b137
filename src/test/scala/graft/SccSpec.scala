package graft

import graft.operators.Scc

/** Pivot-SCC probe: hand-walked cycle + tail, radius cutoff, self-loop /
  * duplicate hygiene, pivot tie-break, and the parameter guard. */
class SccSpec extends SparkSpecBase {

  private def run(edges: Seq[(String, String)], rounds: Int) = {
    import spark.implicits._
    Scc.pivotSccSummary(edges.toDF("s", "d"), "s", "d", rounds)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
  }

  // Cycle a->b->c->a with tail c->d: degrees a=2 b=2 c=3 d=1 -> pivot c.
  private val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))

  test("cycle + tail: core is the cycle, tail only forward-reachable") {
    val out = run(g, rounds = 3)
    assert(out == Seq(("backward", "c", 3L), ("core", "c", 3L),
      ("forward", "c", 4L)))
  }

  test("radius cutoff at rounds=1") {
    // forward from c: {c, a, d}; backward: {c, b}; core: {c}.
    val out = run(g, rounds = 1)
    assert(out == Seq(("backward", "c", 2L), ("core", "c", 1L),
      ("forward", "c", 3L)))
  }

  test("edges empty after self-loop filtering return an empty summary, " +
      "not NoSuchElementException") {
    assert(run(Seq.empty, rounds = 2).isEmpty)
    assert(run(Seq(("a", "a"), ("b", "b")), rounds = 2).isEmpty)
  }

  test("self-loops and duplicate edges do not change the probe") {
    val noisy = g ++ Seq(("c", "c"), ("a", "b"), ("a", "b"))
    assert(run(noisy, rounds = 3) == run(g, rounds = 3))
  }

  test("pivot ties break to the lexicographically smallest node") {
    // x->y and y->x: both degree 2 -> pivot x; core = {x, y}.
    val out = run(Seq(("y", "x"), ("x", "y")), rounds = 2)
    assert(out.forall(_._2 == "x"))
    assert(out.find(_._1 == "core").get._3 == 2L)
  }

  test("rounds must be positive") {
    intercept[IllegalArgumentException] { run(g, rounds = 0) }
  }
}
