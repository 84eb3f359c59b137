package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot strongly-connected-component probe on a DIRECTED graph — the
  * forward-backward intersection step of divide-and-conquer SCC
  * (Fleischer, Hendrickson & Pınar 2000; the same primitive GraphX's and
  * multistep SCC algorithms iterate): pick the highest-degree pivot,
  * close `rounds` hops forward and `rounds` hops backward, and intersect
  * — every node in F ∩ B is mutually reachable with the pivot within the
  * radius (the hub SCC a cycle-structure audit wants to see first; with
  * rounds ≥ diameter it IS the pivot's exact SCC).
  *
  * Distributed shape: two [[Bfs]]-discipline closures over the directed
  * adjacency (per round one src-keyed semi-join + distinct + anti-join
  * against visited, localCheckpoint per round), one semi-join to
  * intersect. The pivot itself is ONE TakeOrdered row. Node identity is
  * stringly (tokens, URLs, ids cast canonically by the caller); the
  * order-invariant checksum is the md5-prefix integer sum — the same
  * engine-portable hash the HLL oracle uses. A fixed unroll with
  * [[oracleCtes]] keeps both engines in bit-lockstep. */
object Scc {

  private def chk(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Three summary rows (forward / backward / core): pivot, n_nodes and
    * the order-invariant node checksum of each closure. `edges` is any
    * directed relation; self-loops and duplicates are dropped. */
  def pivotSccSummary(edges: DataFrame, srcCol: String, dstCol: String,
                      rounds: Int): DataFrame = {
    require(rounds >= 1, "scc probe needs at least one expansion round")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    // An edge relation that is empty after self-loop/duplicate filtering
    // has no pivot to probe from: return the empty summary, don't throw.
    val pivotRow = e.select(col("src").as("n"))
      .unionAll(e.select(col("dst").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .orderBy(col("d").desc, col("n")).limit(1)
      .collect().headOption
    if (pivotRow.isEmpty)
      return spark.range(0).select(
        lit("").as("relation"), lit("").as("pivot"),
        lit(0L).as("n_nodes"), lit(0L).as("checksum"))
    val pivot = pivotRow.get.getString(0)
    def closure(adj: DataFrame): DataFrame = {
      var frontier = Seq(pivot).toDF("n").localCheckpoint(true)
      var visited = frontier
      for (_ <- 1 to rounds) {
        frontier = adj
          .join(frontier.select(col("n").as("src")), Seq("src"), "left_semi")
          .select(col("dst").as("n")).distinct()
          .join(visited, Seq("n"), "left_anti")
          .localCheckpoint(true)
        visited = visited.unionAll(frontier).localCheckpoint(true)
      }
      visited
    }
    val fwd = closure(e).localCheckpoint(true)
    val bwd = closure(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val core = fwd.join(bwd, Seq("n"), "left_semi")
    def row(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_nodes"), sum(chk(col("n"))).as("checksum"))
        .select(lit(label).as("relation"), lit(pivot).as("pivot"),
          col("n_nodes"), col("checksum"))
    row(fwd, "forward").unionAll(row(bwd, "backward"))
      .unionAll(row(core, "core"))
      .orderBy("relation")
  }

  /** Generated DuckDB replay: pivot pick, both closures as chained
    * MATERIALIZED frontier CTEs, the intersection, and the same
    * md5-prefix checksums. `edgesSql` must yield DISTINCT, loop-free
    * (src, dst) VARCHAR pairs. Emits CTEs through `core`; the caller's
    * final SELECT unions the three summary rows (relations `fw$rounds`,
    * `bw$rounds` visited sets are `fv`/`bv`). */
  def oracleCtes(edgesSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e0 AS MATERIALIZED ($edgesSql),
      pv AS MATERIALIZED (SELECT n FROM (
          SELECT n, count(*) AS d FROM
            (SELECT src AS n FROM e0 UNION ALL SELECT dst FROM e0)
          GROUP BY n)
        ORDER BY d DESC, n LIMIT 1),
      ff0 AS MATERIALIZED (SELECT n FROM pv),
      fv0 AS MATERIALIZED (SELECT n FROM ff0),
      bf0 AS MATERIALIZED (SELECT n FROM pv),
      bv0 AS MATERIALIZED (SELECT n FROM bf0)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        ff$r AS MATERIALIZED (SELECT DISTINCT dst AS n FROM e0
                WHERE src IN (SELECT n FROM ff$p)
                  AND dst NOT IN (SELECT n FROM fv$p)),
        fv$r AS MATERIALIZED (SELECT n FROM fv$p
                UNION ALL SELECT n FROM ff$r),
        bf$r AS MATERIALIZED (SELECT DISTINCT src AS n FROM e0
                WHERE dst IN (SELECT n FROM bf$p)
                  AND src NOT IN (SELECT n FROM bv$p)),
        bv$r AS MATERIALIZED (SELECT n FROM bv$p
                UNION ALL SELECT n FROM bf$r)""")
    }
    sb.append(s""",
      core AS (SELECT n FROM fv$rounds
               WHERE n IN (SELECT n FROM bv$rounds))""")
    sb.toString
  }

  /** The checksum expression as DuckDB SQL over a node column. */
  def chkSql(col: String): String =
    s"CAST(('0x' || substr(md5($col), 1, 8)) AS BIGINT)"
}
