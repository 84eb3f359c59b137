package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PCA, top principal component by power iteration (von Mises
  * & Pollaczek-Geiringer 1929; the standard first step of embedding-space
  * diagnostics — dominant-direction removal, anisotropy measurement,
  * whitening): ONE distributed pass computes the exact integer second
  * moments of the quantized corpus, and the 64×64 iteration itself runs
  * driver-side in arbitrary-precision integers — the matrix is KB-scale
  * (dim², independent of corpus size), exactly the centroid-table
  * convention used by DetKMeans.
  *
  * Exactness contract: embeddings quantize to 1e-3 units (u = ⌊x·1000 +
  * 0.5⌋, |u| ≤ ~1000), so the per-pair moment sums Σ uᵢuⱼ stay within
  * Long for corpora up to ~10⁹ rows, and the scatter matrix
  * Cn[i][j] = N·Σuᵢuⱼ − (Σuᵢ)(Σuⱼ) — which is N² times the covariance,
  * a positive rescale that leaves eigenvectors untouched — is exact
  * integer. Each power round renormalizes to max|v| = 10⁴ with
  * TRUNCATING division (Scala BigInt `/` and DuckDB HUGEINT `//` both
  * truncate toward zero — verified, the floor/trunc mismatch would break
  * parity on negative components), so every round is replayable: the
  * generated oracle ([[oracleCtes]]) re-runs the whole computation —
  * quantization, moments, scatter, all R rounds — in SQL.
  *
  * Scale shape: the only corpus-sized work is the (i, j) moment
  * aggregate — a row-local dim² explosion feeding one partial-aggregated
  * shuffle of at most dim² groups. No iteration touches the corpus; v₀ is
  * the all-ones vector and the iteration is deterministic (sign included).
  */
object Pca {

  val Scale = 10000L

  /** (dim, pc1_unit) rows, dim 1-based, max|pc1_unit| = 10⁴ after the
    * final renormalization. */
  def topComponent(df: DataFrame, idCol: String, embCol: String,
                   dim: Int, rounds: Int = 8): DataFrame = {
    val spark = df.sparkSession
    // slice to dim mirrors the oracle's `emb[1:dim]` — an over-long array
    // would otherwise index past dim (crash), a short one would null cn.
    val e = df.select(col(idCol).cast("long").as("id"),
      transform(slice(col(embCol), 1, dim),
        x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")).as("u"))
    val ei = e.select(col("u"), posexplode(col("u")).as(Seq("i0", "ui")))
    val eij = ei.select(col("i0"), col("ui"),
      posexplode(col("u")).as(Seq("j0", "uj")))
    // Bounded driver reads: dim and dim² rows (the DetKMeans centroid
    // convention) — the corpus never leaves the executors.
    val mRows = ei.groupBy("i0")
      .agg(sum(col("ui")).as("m"), count(lit(1)).as("n")).collect()
    val sRows = eij.groupBy("i0", "j0")
      .agg(sum(col("ui") * col("uj")).as("s")).collect()
    val n = mRows.head.getLong(2)
    val m = Array.ofDim[Long](dim)
    mRows.foreach(r => m(r.getInt(0)) = r.getLong(1))
    val cn = Array.ofDim[BigInt](dim, dim)
    sRows.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      cn(i)(j) = BigInt(n) * r.getLong(2) - BigInt(m(i)) * m(j)
    }
    var v = Array.fill(dim)(BigInt(Scale))
    for (_ <- 1 to rounds) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cn(i)(j) * v(j)).sum)
      val mx = w.map(_.abs).max
      if (mx > 0) v = w.map(x => x * Scale / mx) // BigInt /: truncates
    }
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => ((i + 1).toLong, x.toLong) }
      .toSeq.toDF("dim", "pc1_unit")
  }

  /** Variance explained by the top component — the number the anisotropy
    * diagnostic actually reports (how dominant is the rogue direction).
    * Computes [[topComponent]]'s vector, then ONE more distributed pass
    * projects every row onto it (integer dot products; squares summed in
    * DECIMAL(38,0) — p² reaches ~4·10¹⁷ per row, so Long sums would
    * overflow past ~20 rows) and forms the Rayleigh-quotient ratio
    *   var(proj) / (|v|² · tr(Cov))
    * from exact integer ingredients with one fixed double-op order,
    * floored to 6 dp. Output: one row
    * (n_rows, trace_cn, var_ratio6). */
  def varianceExplained(df: DataFrame, idCol: String, embCol: String,
                        dim: Int, rounds: Int = 8): DataFrame = {
    val pc = topComponent(df, idCol, embCol, dim, rounds)
      .orderBy("dim").collect().map(_.getLong(1))
    val e = df.select(
      transform(slice(col(embCol), 1, dim),
        x => floor(x.cast("double") * 1000 + lit(0.5)).cast("long")).as("u"))
    val vArr = array(pc.map(lit): _*)
    val p = aggregate(zip_with(col("u"), vArr, (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    // Exact pieces, two bounded aggregates: (N, Σp, Σp²) over the
    // projections and the per-dim (Σuᵢ, Σuᵢ²) sums behind the trace.
    val pr = e.select(p.as("p"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum((col("p") * col("p"))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("spp"))
      .head()
    val tr = e.select(posexplode(col("u")).as(Seq("i0", "ui")))
      .groupBy("i0")
      .agg(sum(col("ui")).as("m"), sum(col("ui") * col("ui")).as("s"))
      .agg(sum(col("m")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("m"))
          .as("mm"),
        sum(col("s")).as("ss"))
      .head()
    val n = BigInt(pr.getLong(0))
    val traceCn = n * tr.getLong(1) - tr.getDecimal(0).toBigInteger
    val varP = n * pr.getDecimal(2).toBigInteger - BigInt(pr.getLong(1)).pow(2)
    val v2 = pc.map(x => BigInt(x) * x).sum
    // Correctly-rounded int→double conversions, then ONE division — the
    // exact op sequence the oracle's CAST(… AS DOUBLE)/CAST(… AS DOUBLE)
    // performs (BigDecimal division would round differently).
    val ratio6 = math.floor(
      varP.doubleValue / (v2 * traceCn).doubleValue * 1e6) / 1e6
    import df.sparkSession.implicits._
    Seq((pr.getLong(0), traceCn.toLong, ratio6))
      .toDF("n_rows", "trace_cn", "var_ratio6")
  }

  /** Generated DuckDB replay: quantization, exact moments, scatter
    * matrix, and all `rounds` power rounds with the same truncating
    * renormalization. Emits CTEs up to `v<rounds>`; the final SELECT is
    * the caller's. */
  def oracleCtes(table: String, idCol: String, embCol: String,
                 dim: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e AS MATERIALIZED (
        SELECT CAST($idCol AS BIGINT) AS id,
          list_transform($embCol[1:$dim],
            x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS u
        FROM $table),
      dims AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, ${dim + 1}) t(i)),
      mm AS MATERIALIZED (
        SELECT i, sum(u[i]) AS m, count(*) AS n FROM e, dims GROUP BY i),
      ss AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(e.u[a.i] * e.u[b.i]) AS s
        FROM e, dims a, dims b GROUP BY 1, 2),
      cn AS MATERIALIZED (
        SELECT ss.i, ss.j,
          CAST(mi.n AS HUGEINT) * ss.s - CAST(mi.m AS HUGEINT) * mj.m AS c
        FROM ss JOIN mm mi ON mi.i = ss.i JOIN mm mj ON mj.i = ss.j),
      v0 AS (SELECT i, CAST(${Scale} AS HUGEINT) AS v FROM dims)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
        w$r AS MATERIALIZED (
          SELECT cn.i, sum(cn.c * vp.v) AS w
          FROM cn JOIN v$p vp ON vp.i = cn.j GROUP BY cn.i),
        v$r AS MATERIALIZED (
          SELECT i, (w * ${Scale}) // (SELECT max(abs(w)) FROM w$r) AS v
          FROM w$r)""")
    }
    sb.toString
  }
}
