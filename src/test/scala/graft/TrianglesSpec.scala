package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Degree-oriented triangle counting: exact counts on hand graphs, each
  * triangle found once, and robustness to dirty edge lists. */
class TrianglesSpec extends SparkSpecBase {

  private def tri(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Triangles.triangles(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("K4 has exactly its 4 triangles, each once") {
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    assert(tri(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("duplicate, reversed, and loop edges do not change the count") {
    val dirty = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L), (1L, 2L))
    assert(tri(dirty) == Set((1L, 2L, 3L)))
  }

  test("a star has no triangles; closing one spoke pair makes exactly one") {
    val star = (2L to 20L).map(i => (1L, i))
    assert(tri(star).isEmpty)
    assert(tri(star :+ (2L, 3L)) == Set((1L, 2L, 3L)))
  }

  test("wedge centers are low-degree: hub out-degree stays bounded") {
    // Star + ring around the hub: the hub has degree 19 but every edge
    // orients AWAY from higher-(deg, id), so the hub is never a wedge
    // center with more than a few out-neighbors.
    import spark.implicits._
    val star = (2L to 20L).map(i => (1L, i))
    val ring = (2L until 20L).map(i => (i, i + 1L))
    val o = Triangles.orient((star ++ ring).toDF("a", "b"), "a", "b")
    val maxOut = o.groupBy("src").agg(count(lit(1)).as("d"))
      .agg(max("d")).head.getLong(0)
    // Hub degree is 19; ring nodes have degree 3. The hub must not hold
    // its 19 edges as out-edges.
    assert(maxOut <= 3, s"orientation failed to bound out-degree: $maxOut")
  }
}
