package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame power-iteration PageRank (Page et al. 1999, "The PageRank
  * Citation Ranking"), the standard link-analysis pass a crawl-curation
  * pipeline runs over the host graph to prioritize what to keep at corpus
  * scale.
  *
  * Engine-portable determinism: double sums are order-dependent in the last
  * ulp, and Spark's partial-aggregation order is nondeterministic — so each
  * iteration converts per-edge contributions to integer picorank units
  * (`floor(rank/outdeg · 10¹² + 0.5)` as BIGINT) and sums those. Integer
  * sums are exact and order-independent, so every iteration's ranks are
  * bit-identical across runs AND across engines (the DuckDB oracle replays
  * the same unit arithmetic). Overflow headroom: total rank mass is ~N, so
  * unit sums stay ≤ N·10¹² ≪ 2⁶³ for any N this engine meets per job.
  *
  * Scale shape: one hash-shuffle per iteration (groupBy dst), joined
  * against an `edges` relation that stays partitioned by src throughout;
  * ranks are localCheckpoint'd every few rounds so the lineage (and thus
  * the replanning cost) stays O(1) instead of O(iterations). Dangling
  * nodes contribute nothing (their mass evaporates, the classic
  * "simplified PageRank" variant) — callers who need ergodicity pass a
  * symmetrized edge list, as the registry query does.
  */
object PageRank {

  /** Ranks after exactly `iterations` rounds.
    *
    * @param edges directed edges with `srcCol`/`dstCol`; parallel edges are
    *              collapsed. Nodes = every id appearing as src or dst.
    * @return (node, rank) — rank rounded to 9 dp at the end (deterministic
    *         floor(x·10⁹+0.5) rounding, same as the oracle).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint() // tiny relation, reused every round
    val n = nodes.count()
    // Degree-annotated edge list, materialized ONCE: without this the
    // scan + distinct + degree aggregation re-executes inside every
    // iteration (the dominant cost — an extra shuffle over the edge set
    // per round).
    val eDeg = e.join(
        e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()

    val base = lit((1.0 - damping) / n)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      // Integer picorank units: exact, order-independent summation. One
      // shuffle join (ranks ⋈ edges on src) + one aggregation per round.
      val contribs = ranks
        .join(eDeg, ranks("node") === eDeg("src"))
        .select(col("dst"),
          floor(col("rank") / col("outdeg") * 1e12 + 0.5).cast("long").as("units"))
        .groupBy("dst").agg(sum("units").as("in_units"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"),
          (base + lit(damping) *
            (coalesce(col("in_units"), lit(0L)).cast("double") / 1e12)).as("rank"))
      // Truncate lineage every 3 rounds: keeps the plan O(1) deep (and
      // AQE re-plans each chunk with real sizes). Recompute on executor
      // loss is acceptable — each round is cheap relative to the
      // full-lineage replay this prevents. At bench scale the per-round
      // wall time is scheduler-floor-bound (tasks are ~KB); the
      // data-proportional costs — one co-partitioned join + one partial
      // aggregation over the edge set per round — are what scale.
      if (i % 3 == 0 && i < iterations) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"),
      (floor(col("rank") * 1e9 + 0.5) / 1e9).as("rank"))
  }

  /** The matching DuckDB oracle: unrolled CTE chain replaying the exact
    * unit arithmetic of [[run]]. `edgesSql` must produce DISTINCT (src,
    * dst) pairs. Generated, not hand-written, so iteration count and
    * damping stay in lockstep with the Scala. */
  def oracleSql(edgesSql: String, iterations: Int = 10,
                damping: Double = 0.85): String = {
    val body = new StringBuilder
    body ++= s"""WITH e AS ($edgesSql),
      nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      n_cte AS (SELECT COUNT(*) AS n FROM nodes),
      outdeg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
      r0 AS (SELECT node, CAST(1.0 AS DOUBLE)/(SELECT n FROM n_cte) AS rank FROM nodes)"""
    // Every fractional literal is CAST(... AS DOUBLE): DuckDB parses bare
    // 0.85 as DECIMAL(3,2), which would silently switch the arithmetic to
    // decimal and break bit-lockstep with the Scala double math.
    for (i <- 1 to iterations) {
      body ++= s""",
      c$i AS (SELECT e.dst, SUM(CAST(FLOOR(r.rank / outdeg.outdeg * 1e12 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS in_units
              FROM r${i - 1} r JOIN outdeg ON r.node = outdeg.src JOIN e ON e.src = outdeg.src
              GROUP BY e.dst),
      r$i AS (SELECT nodes.node,
                (CAST(1.0 AS DOUBLE) - CAST($damping AS DOUBLE))/(SELECT n FROM n_cte)
                  + CAST($damping AS DOUBLE) * (COALESCE(c$i.in_units, 0) / 1e12) AS rank
              FROM nodes LEFT JOIN c$i ON nodes.node = c$i.dst)"""
    }
    body ++= s"""
      SELECT node, FLOOR(rank * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9 AS rank
      FROM r$iterations ORDER BY node"""
    body.toString
  }
}
