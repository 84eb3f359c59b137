package graft

import java.nio.file.Files

/** Round-15 pins for q_graph_rectangles: a planted K₂,₃ biclique reads
  * support C(3,2) = 3 on its diagonal (4,8) while the wing pairs read 1,
  * and a plain triangle produces no rectangle support above zero. */
class RectanglesSpec extends SparkSpecBase {

  private def lineitemDir(orders: Seq[Seq[Long]]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rect").toString
    orders.zipWithIndex
      .flatMap { case (parts, o) => parts.map(p => (o.toLong + 1, p)) }
      .toDF("l_orderkey", "l_partkey")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def run(orders: Seq[Seq[Long]]): Seq[(Long, Long, Long, Long)] = {
    spark.conf.set("graft.graph.sideTable", "false")
    try SparkEntry.queries("q_graph_rectangles")(spark, lineitemDir(orders))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    finally spark.conf.unset("graft.graph.sideTable")
  }

  test("planted K2,3: diagonal support C(3,2)=3, wing pairs support 1") {
    // Parts 4,8 (the diagonal) each co-purchased with wings 12,16,20 via
    // two-part orders; all ids ≡ 0 (mod 4) to survive the subgraph filter.
    val edges = Seq(
      Seq(4L, 12L), Seq(4L, 16L), Seq(4L, 20L),
      Seq(8L, 12L), Seq(8L, 16L), Seq(8L, 20L))
    assert(run(edges) == Seq(
      (4L, 8L, 3L, 3L),
      (12L, 16L, 2L, 1L), (12L, 20L, 2L, 1L), (16L, 20L, 2L, 1L)))
  }

  test("a triangle closes wedges but no rectangle (cn=1 everywhere)") {
    val got = run(Seq(Seq(4L, 8L), Seq(8L, 12L), Seq(4L, 12L)))
    assert(got.nonEmpty && got.forall(_._4 == 0L),
      s"triangle pairs share exactly one neighbor: $got")
  }
}
