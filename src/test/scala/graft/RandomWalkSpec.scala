package graft

import graft.operators.RandomWalk

/** Deterministic random walks: hand-checkable degenerate graphs (where
  * "random" has only one choice), md5-pick reproducibility, dead-end
  * termination, and salt independence. */
class RandomWalkSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], seedsMod: Long, steps: Int,
                  salt: String = "walk"): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    RandomWalk.walkSummary(edges.toDF("src", "dst"), "src", "dst",
        seedsMod, steps, salt)
      .orderBy("step").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("a directed ring forces the walk: position = (seed + step) mod n") {
    // 0->1->2->3->0, seed {0}: every node has exactly one out-neighbor,
    // so all picks are forced however the hash lands.
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    assert(run(ring, seedsMod = 4, steps = 5) == Seq(
      (0L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L),
      (4L, 1L, 0L), (5L, 1L, 1L)))
  }

  test("dead ends terminate the walk (walk leaves the relation)") {
    val path = Seq((0L, 1L), (1L, 2L)) // node 2 has no out-edges
    assert(run(path, seedsMod = 100, steps = 3) == Seq(
      (0L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 2L), (3L, 0L, 0L)))
  }

  test("deterministic across runs and row order; walks stay on the graph") {
    val g = for { a <- 0L until 8L; b <- 0L until 8L if a != b } yield (a, b)
    val once = run(g, seedsMod = 2, steps = 6)
    assert(once == run(g.reverse, seedsMod = 2, steps = 6))
    // 4 seeds (0,2,4,6), complete digraph: no walk ever dies, and every
    // position is a valid node so the checksum stays within [0, 4*7].
    assert(once.forall(_._2 == 4L))
    assert(once.forall(r => r._3 >= 0L && r._3 <= 28L))
  }

  test("different salts draw different corpora (same seeds, same graph)") {
    val g = for { a <- 0L until 30L; b <- 0L until 30L if a != b } yield (a, b)
    val a = run(g, seedsMod = 3, steps = 4, salt = "a")
    val b = run(g, seedsMod = 3, steps = 4, salt = "b")
    assert(a.head == b.head, "step 0 is the seed set either way")
    assert(a != b, "independent draws diverge somewhere in 4 steps x 10 walks")
  }

  test("oracle CTEs unroll to the requested depth with the salt inline") {
    val sql = RandomWalk.oracleCtes("SELECT 1 AS src, 2 AS dst", 10, 3, "z")
    assert(sql.contains("s3 AS MATERIALIZED"))
    assert(!sql.contains("s4 AS"))
    assert(sql.contains(":z:2"))
  }

  test("steps = 0 rejected") {
    assertThrows[IllegalArgumentException](run(Seq((0L, 1L)), 10, 0))
  }
}
