package graft

import graft.operators.PageRank

/** PageRank power iteration: closed-form checks on small graphs plus the
  * determinism/mass invariants the DuckDB oracle lockstep depends on. */
class PageRankSpec extends SparkSpecBase {

  private def edges(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "dst")
  }

  test("symmetric 2-node graph converges to equal ranks summing to 1") {
    val out = PageRank.run(edges(("a", "b"), ("b", "a")), "src", "dst",
        iterations = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("a") == 0.5 && out("b") == 0.5)
  }

  test("star graph ranks the hub above the spokes; mass is conserved") {
    // 4 spokes <-> hub (symmetrized): hub collects 4 full contributions,
    // each spoke gets hub/4.
    val spokes = Seq("s1", "s2", "s3", "s4")
    val e = edges(spokes.flatMap(s => Seq(s -> "hub", "hub" -> s)): _*)
    val out = PageRank.run(e, "src", "dst", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("hub") > out("s1"))
    assert(spokes.map(out).distinct.size == 1) // spokes symmetric
    val mass = out.values.sum
    assert(math.abs(mass - 1.0) < 1e-6, s"mass drifted: $mass")
  }

  test("dangling nodes lose mass (simplified PageRank contract)") {
    // a -> b with NO back edge: b is dangling, mass evaporates.
    val out = PageRank.run(edges(("a", "b")), "src", "dst", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.values.sum < 1.0)
    assert(out("b") > out("a")) // b still receives a's contribution
  }

  test("parallel edges collapse; run is deterministic across invocations") {
    val e = edges(("a", "b"), ("a", "b"), ("b", "c"), ("c", "a"))
    val r1 = PageRank.run(e, "src", "dst", iterations = 7)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val r2 = PageRank.run(e, "src", "dst", iterations = 7)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(r1 == r2)
    // a->b (collapsed), b->c, c->a is a 3-cycle: all ranks equal
    assert(r1.values.toSeq.distinct.size == 1)
  }

  test("iterations must be positive") {
    intercept[IllegalArgumentException] {
      PageRank.run(edges(("a", "b")), "src", "dst", iterations = 0)
    }
  }
}
