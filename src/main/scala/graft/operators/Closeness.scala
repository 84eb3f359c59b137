package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source harmonic closeness centrality (Marchiori & Latora 2000;
  * Boldi & Vigna 2014 make the case that harmonic centrality is the
  * right closeness on disconnected graphs): H(s) = Σ_{n ≠ s, reached}
  * 1/dist(s, n), accumulated per seed over a fixed unroll of R
  * breadth-first rounds. Exactness: the hop-d contribution is the
  * INTEGER 10⁶ div d, so per-seed scores are exact integer sums — no
  * doubles anywhere, and a fixed unroll with the generated
  * [[oracleCtes]] keeps both engines in bit-lockstep by construction.
  *
  * Distributed shape: the frontier is keyed (seed, node) so ALL seeds
  * traverse in one pass per round — one src-partitioned equi-join of the
  * adjacency, a distinct, one anti-join against the visited pair set
  * (the [[Bfs]] discipline lifted to pairs); localCheckpoint per round
  * truncates the multiplying lineage. The (|S| × reach) pair relation is
  * the inherent cost of exact multi-source distances; |S| stays bounded
  * by the seed predicate — at 100 TB you sample pivots
  * (Eppstein–Wang-style estimation), which is exactly this operator with
  * a sparser modulus. Per-round summaries are seed-count-sized and
  * accumulate driver-side (the Bfs precedent). */
object Closeness {

  /** Per-seed (seed, n_reached, harmonic_micro) after `rounds` expansion
    * rounds from the seed set {n : n % seedsMod == 0}. Edges must be
    * canonical (lo < hi, distinct) — [[Triangles.canonical]] output. */
  def harmonicSummary(canonEdges: DataFrame, seedsMod: Long,
                      rounds: Int): DataFrame = {
    require(rounds >= 1, "closeness needs at least one expansion round")
    val spark = canonEdges.sparkSession
    val edges = canonEdges.select(col("lo"), col("hi")).localCheckpoint(true)
    val adj = edges.select(col("lo").as("src"), col("hi").as("dst"))
      .unionAll(edges.select(col("hi").as("src"), col("lo").as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    val seeds = edges.select(col("lo").as("n"))
      .unionAll(edges.select(col("hi").as("n")))
      .distinct()
      .filter(pmod(col("n"), lit(seedsMod)) === 0)
    var frontier = seeds.select(col("n").as("s"), col("n"))
      .localCheckpoint(true)
    var visited = frontier
    // Per-seed accumulators live on the driver: each round's aggregate is
    // |S| rows, the same size class as Bfs's per-hop summary row.
    val acc = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
    seeds.collect().foreach(r => acc(r.getLong(0)) = (0L, 0L))
    for (r <- 1 to rounds) {
      frontier = adj
        .join(frontier.select(col("s"), col("n").as("src")), Seq("src"))
        .select(col("s"), col("dst").as("n")).distinct()
        .join(visited, Seq("s", "n"), "left_anti")
        .localCheckpoint(true)
      visited = visited.unionAll(frontier).localCheckpoint(true)
      val unit = 1000000L / r // exact integer micro-units per hop-r node
      frontier.groupBy("s").agg(count(lit(1)).as("c")).collect()
        .foreach { row =>
          val (s, c) = (row.getLong(0), row.getLong(1))
          val (n0, h0) = acc(s)
          acc(s) = (n0 + c, h0 + c * unit)
        }
    }
    import spark.implicits._
    acc.toSeq.map { case (s, (n, h)) => (s, n, h) }
      .toDF("seed", "n_reached", "harmonic_micro")
      .orderBy("seed")
  }

  /** Generated DuckDB replay: R expansion rounds over (seed, node) pair
    * frontiers as chained MATERIALIZED CTEs above a canonical edge CTE
    * from `edgesSql`; per-round contributions carry the same integer
    * 10⁶ div r units. Emits CTEs through `agg`; the final SELECT is the
    * caller's (left-join `agg` from the seed relation `s0`). */
  def oracleCtes(edgesSql: String, seedsMod: Long, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e0 AS MATERIALIZED ($edgesSql),
      adj AS MATERIALIZED (SELECT lo AS src, hi AS dst FROM e0
              UNION ALL SELECT hi, lo FROM e0),
      s0 AS MATERIALIZED (SELECT DISTINCT n AS s FROM
              (SELECT lo AS n FROM e0 UNION ALL SELECT hi FROM e0)
            WHERE n % $seedsMod = 0),
      f0 AS MATERIALIZED (SELECT s, s AS n FROM s0),
      v0 AS MATERIALIZED (SELECT s, n FROM f0)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        f$r AS MATERIALIZED (SELECT DISTINCT f.s, adj.dst AS n
                FROM adj JOIN f$p f ON adj.src = f.n
                WHERE NOT EXISTS (SELECT 1 FROM v$p v
                                  WHERE v.s = f.s AND v.n = adj.dst)),
        v$r AS MATERIALIZED (SELECT s, n FROM v$p
                UNION ALL SELECT s, n FROM f$r)""")
    }
    sb.append(s""",
      su AS (${(1 to rounds).map { r =>
      s"""SELECT s, CAST(count(*) AS BIGINT) AS c,
            CAST(count(*) * ${1000000L / r} AS BIGINT) AS h
          FROM f$r GROUP BY s"""
    }.mkString(" UNION ALL ")}),
      agg AS (SELECT s, CAST(sum(c) AS BIGINT) AS n_reached,
                CAST(sum(h) AS BIGINT) AS harmonic_micro
              FROM su GROUP BY s)""")
    sb.toString
  }
}
