package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et al.
  * 2007, "Near linear time algorithm to detect community structures in
  * large-scale networks"): every node starts in its own community (label =
  * node id) and each round adopts the label most frequent among its
  * neighbors, ties broken toward the smallest label. The deterministic
  * synchronous variant is the one a distributed engine wants — no
  * sequential sweep, every node updates from the SAME previous-round
  * snapshot — and with a fixed unroll R plus fully-ordered tie-breaks the
  * whole run is replayable in SQL, so the oracle ([[oracleCtes]]) is
  * generated in lockstep exactly like PageRank / k-core.
  *
  * Scale shape per round: one equi-join of the (2|E|)-row neighbor relation
  * against the (|V|)-row label snapshot, one (node, label) count aggregate,
  * and one per-node argmax — all key-partitioned, no driver-side graph
  * state. The argmax is `max(struct(count, -label))`, a plain aggregate
  * (no window): per-node candidate labels are bounded by degree, and the
  * struct-max picks highest count then smallest label in one codegen'd
  * pass. Labels are localCheckpoint'd per round — the join-on-join lineage
  * otherwise grows geometrically (the k-core lesson, KCore.scala).
  *
  * Synchronous LPA can oscillate on bipartite structures; a fixed R with
  * the per-round community count surfaced makes that visible rather than
  * hidden (two equal consecutive rounds witness a fixpoint), and the
  * oracle replays the same R rounds so both engines agree by construction.
  */
object LabelProp {

  /** Per-round community summary over canonical undirected edges
    * (lo < hi, distinct — [[Triangles.canonical]] produces exactly that):
    * one row per round r = 0..rounds with the number of distinct
    * communities and the largest community's size. Round 0 is the
    * all-singletons start. */
  def propagateSummary(canonEdges: DataFrame, rounds: Int): DataFrame = {
    val spark = canonEdges.sparkSession
    val edges = canonEdges.select(col("lo"), col("hi")).localCheckpoint(true)
    // Both directions once, reused every round (checkpointed so each
    // round's join re-reads materialized blocks, not the edge lineage).
    val nbr = edges.select(col("lo").as("n"), col("hi").as("m"))
      .unionAll(edges.select(col("hi").as("n"), col("lo").as("m")))
      .localCheckpoint(true)
    var labels = nbr.select(col("n")).distinct()
      .select(col("n"), col("n").as("lbl"))
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 0 to rounds) {
      val c = labels.groupBy("lbl").agg(count(lit(1)).as("sz"))
        .agg(count(lit(1)).as("nc"), max(col("sz")).as("mx")).head()
      out += ((r.toLong, c.getLong(0), c.getLong(1)))
      if (r < rounds) {
        // Each neighbor m contributes its previous-round label to n; the
        // per-node winner is argmax by (count, then smallest label).
        val votes = nbr
          .join(labels.withColumnRenamed("n", "m"), Seq("m"))
          .groupBy("n", "lbl").agg(count(lit(1)).as("c"))
        labels = votes
          .groupBy("n")
          .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("w"))
          .select(col("n"), (-col("w.neg")).as("lbl"))
          .localCheckpoint(true)
      }
    }
    import spark.implicits._
    out.toSeq.toDF("round", "n_communities", "largest")
  }

  /** Generated DuckDB replay of the same R rounds over a canonical edge
    * CTE provided as `edgesSql` (columns lo, hi). Produces label CTEs
    * l0..lR and a per-round `summary`; the final SELECT is the caller's. */
  def oracleCtes(edgesSql: String, rounds: Int): String = {
    val sb = new StringBuilder
    // MATERIALIZED like KCore.oracleCtes: each round references its parent
    // repeatedly, and DuckDB would otherwise inline l_{r-1} exponentially.
    sb.append(s"WITH e0 AS MATERIALIZED ($edgesSql)")
    sb.append(""",
      nbr AS MATERIALIZED (SELECT lo AS n, hi AS m FROM e0
                           UNION ALL SELECT hi AS n, lo AS m FROM e0),
      l0 AS MATERIALIZED (SELECT DISTINCT n, n AS lbl FROM nbr)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        c$r AS MATERIALIZED (
          SELECT nbr.n, l.lbl, count(*) AS c
          FROM nbr JOIN l$p l ON l.n = nbr.m GROUP BY nbr.n, l.lbl),
        l$r AS MATERIALIZED (
          SELECT n, lbl FROM (
            SELECT n, lbl, row_number() OVER (
              PARTITION BY n ORDER BY c DESC, lbl) AS rn FROM c$r)
          WHERE rn = 1)""")
    }
    sb.append(s""",
      summary AS (${(0 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
            count(DISTINCT lbl) AS n_communities,
            (SELECT max(sz) FROM (
              SELECT count(*) AS sz FROM l$r GROUP BY lbl)) AS largest
          FROM l$r"""
    }.mkString(" UNION ALL ")})""")
    sb.toString
  }
}
