package graft

import graft.llm.Dbscan
import org.apache.spark.sql.functions._

/** Hand-drawn line-world fixture for deterministic DBSCAN: every
  * core/border/noise verdict and cluster label below is derivable by eye
  * (1-D integer positions, ε² = 4, minPts = 4 counting self — core needs
  * 3 neighbors). Pins the two subtle rules: a point whose only neighbor
  * is a BORDER point is noise (density-reachability goes through cores
  * only), and border points attach to their minimum-id core neighbor. */
class DbscanSpec extends SparkSpecBase {

  test("dbscan: line-world cores, min-core-neighbor borders, " +
      "border-only-neighbor noise") {
    import spark.implicits._
    val pts = Seq(
      // cluster at x = 0..4: cores {2,3,4}, borders {1, 5}
      (1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      // cluster at x = 20..23 + 25: cores {11,12,13}, borders {10, 20}
      (10L, 20L), (11L, 21L), (12L, 22L), (13L, 23L), (20L, 25L),
      // 21's only neighbor is border 20 → noise; 30 is isolated noise
      (21L, 27L), (30L, 100L))
      .map { case (id, x) => (id, Seq(x, 0L)) }
      .toDF("id", "u")
    val out = Dbscan.assign(pts, "id", "u", eps2 = 4L, minPts = 4)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, "border", 2L), (2L, "core", 2L), (3L, "core", 2L),
      (4L, "core", 2L), (5L, "border", 2L),
      (10L, "border", 11L), (11L, "core", 11L), (12L, "core", 11L),
      (13L, "core", 11L), (20L, "border", 11L),
      (21L, "noise", -1L), (30L, "noise", -1L)))
  }

  test("dbscan: driver and distributed paths are output-identical on " +
      "the line-world fixture") {
    import spark.implicits._
    val pts = Seq(
      (1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L),
      (10L, 20L), (11L, 21L), (12L, 22L), (13L, 23L), (20L, 25L),
      (21L, 27L), (30L, 100L))
      .map { case (id, x) => (id, Seq(x, 0L)) }
      .toDF("id", "u")
    def run(maxDriverPairs: Long) =
      Dbscan.assign(pts, "id", "u", eps2 = 4L, minPts = 4,
          maxDriverPairs = maxDriverPairs)
        .orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .toSeq
    assert(run(0L) == run(Long.MaxValue))
  }

  test("dbscan: a singleton core (dense pair world) keeps its own id " +
      "as the cluster label") {
    import spark.implicits._
    // Three coincident points: each has 2 neighbors → with minPts = 3
    // all are core; the core-core component labels the trio by min id.
    // A fourth point far away is isolated noise.
    val pts = Seq((7L, 5L), (8L, 5L), (9L, 5L), (40L, 50L))
      .map { case (id, x) => (id, Seq(x, 0L)) }
      .toDF("id", "u")
    val out = Dbscan.assign(pts, "id", "u", eps2 = 1L, minPts = 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (7L, "core", 7L), (8L, "core", 7L), (9L, "core", 7L),
      (40L, "noise", -1L)))
  }
}
