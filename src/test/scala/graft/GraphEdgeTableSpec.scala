package graft

/** The materialized co-purchase edge side-table must be a pure
  * materialization: every consumer's rows are bit-identical with the
  * side-table on (parquet read) and off (inline lineitem scan + groupBy).
  * `q_graph_edge_table` audits the multiset stats (its DuckDB oracle
  * recomputes from base lineitem at the driver gate); here we pin the
  * on/off equivalence for the audit itself, a full-graph consumer, and a
  * mod-4 subgraph consumer. */
class GraphEdgeTableSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def rows(name: String, sideTable: Boolean): Seq[String] = {
    spark.conf.set("graft.graph.sideTable", sideTable.toString)
    try SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toSeq.mkString("|")).toSeq.sorted
    finally spark.conf.unset("graft.graph.sideTable")
  }

  test("edge-table audit stats are identical materialized vs inline") {
    val mat = rows("q_graph_edge_table", sideTable = true)
    val inl = rows("q_graph_edge_table", sideTable = false)
    assert(mat == inl)
    assert(mat.size == 1)
  }

  test("a full-graph consumer (degree distribution) is bit-identical " +
      "reading the side-table vs building inline") {
    assert(rows("q_graph_degree_dist", sideTable = true) ==
      rows("q_graph_degree_dist", sideTable = false))
  }

  test("a mod-4 subgraph consumer (wcc) is bit-identical reading the " +
      "side-table with a residual endpoint filter vs the pre-filtered " +
      "inline build") {
    assert(rows("q_graph_wcc", sideTable = true) ==
      rows("q_graph_wcc", sideTable = false))
  }
}
