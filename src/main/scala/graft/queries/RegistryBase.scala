package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.Catalog
import graft.header.HeaderDetector
import graft.io.FileReader
import graft.llm.{Decontaminate, Dedup, Index, Multimodal, Pack, SemDedup, Similarity, TextAnalysis, Urls}
import graft.pipeline.Ingestor
import graft.transform.Transformers

import scala.collection.immutable.ListMap

/** Shared loaders and session setup for every registered query.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryBase {

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events"     => normalizeEventTs(df)
      case "embeddings" => normalizeEmbedding(df)
      case _            => df
    }
  }

  /** Drift insurance for the vector column (the events.ts lesson): every
    * ANN/PQ/projection kernel assumes `embedding: array<float>`; if a
    * future data generation ships array<double>, normalize at the load
    * choke point instead of failing 20 queries. */
  private[graft] def normalizeEmbedding(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "embedding").map(_.dataType) match {
      case Some(ArrayType(DoubleType, _)) =>
        df.withColumn("embedding", col("embedding").cast("array<float>"))
      case _ => df
    }

  /** events.parquet has shipped with two physical `ts` types across data
    * generations: TIMESTAMP(NANOS) (surfaced as BIGINT nanos under
    * nanosAsLong) and TIMESTAMP(MICROS) (surfaced as a timestamp).
    * Normalize to BIGINT epoch-nanoseconds at the single load choke point
    * so every downstream `ts div N` keeps a schema-stable contract —
    * DuckDB's `epoch_ns(ts)` agrees with both generations. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) => df
      case Some(TimestampType) | Some(TimestampNTZType) =>
        // Session TZ is UTC, so an NTZ wall-clock reads as the same instant
        // DuckDB's epoch_ns computes.
        df.withColumn("ts",
          unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case _ => df
    }

  /** Runtime session setup: ANSI off (string→number casts must NULL on
    * garbage, like the reference), UTC, bounded shuffle width for local[32]. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Older events.parquet generations carry TIMESTAMP(NANOS); read those
    // as long. Newer TIMESTAMP(MICROS) generations are normalized to the
    // same BIGINT-nanos contract in [[normalizeEventTs]].
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  protected def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => { configure(spark); f(spark, dir) }

  /** Raise a relation's parallelism to the session default when the
    * source scan under-parallelizes (a single small unsplittable file =
    * ONE task, which serializes any heavy per-row kernel that follows).
    * Strictly a widen: when the scan already has ≥ cores partitions —
    * every many-file table at scale — this is a no-op, so nothing is
    * ever shuffled down. Row-location changes never change results
    * (every query is partition-invariant; InvarianceSweep pins it). */
  protected def widen(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  // ---------------------------------------------------------------- F1–F15

  // Shared generated-oracle helpers (used across several domain
  // traits' oracle fragments — kept in the base trait for visibility).

  /** Generated stationary-distribution oracle: the transitions CTE,
    * truncating row-stochastic entries, then eight unrolled
    * matrix-vector CTEs with the identical per-cell flooring. */
  protected lazy val markovStationaryOracle: String = {
    val base = """WITH s AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS prev_type
           FROM events),
         tr AS (SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
           FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         mat AS (SELECT prev_type AS i, next_type AS j,
             n * 1000000 // CAST(sum(n) OVER (PARTITION BY prev_type)
               AS BIGINT) AS p6
           FROM tr),
         ty AS (SELECT DISTINCT event_type AS t FROM events),
         kc AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
         pi0 AS (SELECT t, CAST(1000000 // k AS BIGINT) AS pi
                 FROM ty, kc)"""
    val steps = (1 to 8).map { r =>
      s""",
         pi$r AS (SELECT ty.t, CAST(COALESCE((
               SELECT sum(p.pi * m.p6 // 1000000)
               FROM pi${r - 1} p JOIN mat m
                 ON m.i = p.t AND m.j = ty.t), 0) AS BIGINT) AS pi
           FROM ty)"""
    }.mkString
    base + steps + """
         SELECT t AS event_type, pi AS pi_micro FROM pi8
         ORDER BY event_type"""
  }

  /** Generated PAV oracle: the shared gopher+quality prefix, the
    * calibration bands, then NINE unrolled merge CTEs over four
    * parallel lists — each step locates the FIRST adjacent violation
    * by cross-multiplication and pools it; converged steps pass the
    * lists through unchanged (v IS NULL), so nine steps suffice for
    * ≤10 bands by construction. */
  protected lazy val isotonicOracle: String = {
    def step(i: Int): String = s""",
         p$i AS (SELECT
             CASE WHEN v IS NULL THEN lo
                  ELSE lo[1:v-1] || [lo[v]] || lo[v+2:len(lo)] END AS lo,
             CASE WHEN v IS NULL THEN hi
                  ELSE hi[1:v-1] || [hi[v+1]] || hi[v+2:len(hi)] END AS hi,
             CASE WHEN v IS NULL THEN ns
                  ELSE ns[1:v-1] || [ns[v] + ns[v+1]] || ns[v+2:len(ns)]
                  END AS ns,
             CASE WHEN v IS NULL THEN ps
                  ELSE ps[1:v-1] || [ps[v] + ps[v+1]] || ps[v+2:len(ps)]
                  END AS ps
           FROM (SELECT lo, hi, ns, ps,
               NULLIF(list_position(list_transform(range(1, len(ns)),
                 j -> ps[j] * ns[j+1] > ps[j+1] * ns[j]), true), 0) AS v
             FROM p${i - 1}))"""
    gopherQualityCtes + """,
         db AS (SELECT least(CAST(floor(qq.quality * 10000 + 0.5)
                  AS BIGINT) // 1000, 9) AS band, gp.gp AS y
           FROM qq JOIN gp USING (doc_id)),
         bb AS (SELECT band, CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT)
                    AS pos
                FROM db GROUP BY 1),
         p0 AS (SELECT list(band ORDER BY band) AS lo,
                  list(band ORDER BY band) AS hi,
                  list(n ORDER BY band) AS ns,
                  list(pos ORDER BY band) AS ps FROM bb)""" +
      (1 to 9).map(step).mkString + """
         SELECT CAST(u.i AS BIGINT) AS pool_idx, lo[u.i] AS band_lo,
           hi[u.i] AS band_hi, ns[u.i] AS n, ps[u.i] AS pos,
           ps[u.i] * 10000 // ns[u.i] AS iso4
         FROM p9, UNNEST(range(1, len(ns) + 1)) AS u(i)
         ORDER BY pool_idx"""
  }

  /** Generated MMR oracle: the BM25 candidate CTEs (lifted from
    * q_llm_search_bm25's), integer relevance normalization, the exact
    * cosine matrix, then TEN generated argmax CTEs replaying the greedy
    * pick-by-pick (the [[graft.llm.DetKMeans.oracleCtes]] generated-
    * iteration mechanism applied to a greedy instead of k-means). */
  protected lazy val mmrOracle: String = {
    val base = """WITH tk AS MATERIALIZED (SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents),
         dl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
         qt AS (SELECT doc_id, term, count(*) AS tf FROM tk
                WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM qt GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl
                FROM dl),
         sc AS (SELECT qt.doc_id,
                  CAST(floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                        * (qt.tf * CAST(2.2 AS DOUBLE))
                        / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                        * 10000 + 0.5) AS BIGINT) AS c4
                FROM qt JOIN dl USING (doc_id) JOIN df USING (term), st),
         cand AS MATERIALIZED (SELECT doc_id, CAST(sum(c4) AS BIGINT) AS rel4
                  FROM sc GROUP BY doc_id
                  ORDER BY sum(c4) DESC, doc_id LIMIT 20),
         qv AS (SELECT vec_id, list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT)) AS v
                FROM embeddings),
         cj AS MATERIALIZED (SELECT cand.doc_id, cand.rel4, qv.v
                FROM cand JOIN qv ON qv.vec_id = cand.doc_id),
         cm AS (SELECT max(rel4) AS mrel FROM cj),
         nrm AS MATERIALIZED (SELECT cj.doc_id,
                   cj.rel4 * 10000 // cm.mrel AS rel_norm4, cj.v,
                   CAST(list_sum(list_transform(range(1, 65),
                     i -> cj.v[i] * cj.v[i])) AS BIGINT) AS n2
                 FROM cj, cm),
         p AS MATERIALIZED (SELECT a.doc_id AS ia, b.doc_id AS ib,
                 CAST(floor(CAST(list_sum(list_transform(range(1, 65),
                     i -> a.v[i] * b.v[i])) AS DOUBLE)
                   / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE)))
                   * 10000) AS BIGINT) AS cos4
               FROM nrm a, nrm b WHERE a.doc_id <> b.doc_id),
         s1 AS MATERIALIZED (SELECT [doc_id] AS sel, doc_id AS picked,
                  rel_norm4, CAST(0 AS BIGINT) AS msim,
                  CAST(7 * rel_norm4 AS BIGINT) AS key
                FROM nrm ORDER BY rel_norm4 DESC, doc_id LIMIT 1)"""
    val steps = (2 to 10).map { k =>
      s""",
         e$k AS MATERIALIZED (SELECT c.doc_id, c.rel_norm4,
             (SELECT max(cos4) FROM p, s${k - 1} WHERE p.ia = c.doc_id
                AND list_contains(s${k - 1}.sel, p.ib)) AS msim
           FROM nrm c, s${k - 1}
           WHERE NOT list_contains(s${k - 1}.sel, c.doc_id)),
         s$k AS MATERIALIZED (SELECT list_append(s${k - 1}.sel, e.doc_id) AS sel,
             e.doc_id AS picked, e.rel_norm4, e.msim,
             7 * e.rel_norm4 - 3 * e.msim AS key
           FROM s${k - 1}, e$k e
           ORDER BY 7 * e.rel_norm4 - 3 * e.msim DESC, e.doc_id LIMIT 1)"""
    }.mkString
    val finals = (1 to 10).map(k =>
      s"""SELECT CAST($k AS BIGINT) AS pick_order, picked AS doc_id,
           rel_norm4, msim AS max_sim4, CAST(key AS BIGINT) AS mmr_key
         FROM s$k""").mkString("\n         UNION ALL ")
    base + steps + "\n         SELECT * FROM (" + finals +
      ") ORDER BY pick_order"
  }

  /** Shared oracle prefix for the classifier-pair statistics
    * (q_llm_mcnemar / q_stats_kappa): the gopher-gate CTE chain
    * (q_llm_gopher's) and the quality CTE (q_llm_quality's, as reused by
    * cluster_best), ending at the per-doc gp / qq relations the
    * per-query `j` join composes. */
  protected lazy val gopherQualityCtes: String =
    """WITH gm AS (SELECT doc_id,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS wc,
           CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS nonws,
           CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
           CAST(len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE) AS ellipses,
           string_split(text, chr(10)) AS ls,
           string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         gr AS (SELECT doc_id, wc,
           CASE WHEN wc > 0 THEN floor(nonws / wc * 10000 + 0.5) / 10000
                ELSE 0.0 END AS mean_word_len,
           CASE WHEN wc > 0 THEN floor((hashes + ellipses) / wc * 10000 + 0.5) / 10000
                ELSE 0.0 END AS symbol_word_ratio,
           floor(CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*]'))) AS DOUBLE)
             / len(ls) * 10000 + 0.5) / 10000 AS bullet_line_frac,
           floor(CAST(len(list_filter(ls, l -> trim(l) LIKE '%...')) AS DOUBLE)
             / len(ls) * 10000 + 0.5) / 10000 AS ellipsis_line_frac,
           CASE WHEN wc > 0 THEN
             floor(CAST(len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
               / wc * 10000 + 0.5) / 10000 ELSE 0.0 END AS alpha_word_frac,
           len(list_filter(toks, t -> lower(t) IN
             ('the','a','of','and','to','in','is','that','it','for'))) AS stops
           FROM gm),
         gp AS (SELECT doc_id,
           (wc BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND symbol_word_ratio < 0.1 AND bullet_line_frac < 0.9
             AND ellipsis_line_frac < 0.3 AND alpha_word_frac > 0.8
             AND stops >= 2 AS gp
           FROM gr),
         qm AS (SELECT doc_id,
           CAST(length(text) AS DOUBLE) AS nchars,
           CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ntok,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is','that','it','for',
                        'der','die','das','und','ist','von','zu','mit','auf','ein',
                        'le','la','les','de','et','est','un','une','que','pour',
                        'el','los','y','es','por'))) AS DOUBLE) AS sw
           FROM documents),
         qq AS (SELECT doc_id, floor((
             (CASE WHEN nchars >= 200 AND nchars <= 2000 THEN 1.0
                   WHEN nchars >= 50 THEN 0.5 ELSE 0.0 END) * 0.3
             + (CASE WHEN nchars > 0 THEN alpha / nchars ELSE 0.0 END) * 0.3
             + least((CASE WHEN ntok > 0 THEN sw / ntok ELSE 0.0 END) * 5.0, 1.0) * 0.2
             + (CASE WHEN ntok > 0 AND nchars / ntok >= 3 AND nchars / ntok <= 12
                     THEN 1.0 ELSE 0.0 END) * 0.2) * 10000 + 0.5) / 10000 AS quality
           FROM qm)"""

  /** Shared generated CTEs for the deterministic-PQ oracles: one
    * integer k-means chain per subspace plus the per-subspace ADC
    * lookup relations; [[pqDetUnionAll]] unions the contributions. */
  protected lazy val pqDetCtes: String = {
    val m = 8; val subDim = 8
    val chains = (0 until m).map(s =>
      graft.llm.DetKMeans.oracleCtes("embeddings", "vec_id", "embedding",
        k = 16, iters = 3, dim = subDim, prefix = s"s${s}_",
        lead = if (s == 0) "WITH " else "", sliceFrom = s * subDim))
      .mkString(",\n")
    val contribs = (0 until m).map { s =>
      s"""
         s${s}_qd AS (SELECT c.cid,
             list_sum(list_transform(range(1, ${subDim + 1}),
               i -> (c.c[i] - q.u[i]) * (c.c[i] - q.u[i]))) AS qd
           FROM s${s}_c2 c, (SELECT u FROM s${s}_u0 WHERE id = 0) q),
         s${s}_contrib AS (SELECT a.id, qd
           FROM s${s}_a3 a JOIN s${s}_qd d ON a.cid = d.cid)"""
    }.mkString(",")
    chains + "," + contribs
  }

  protected lazy val pqDetUnionAll: String =
    (0 until 8).map(s => s"SELECT id, qd FROM s${s}_contrib")
      .mkString(" UNION ALL ")

  /** Generated IVFADC replay: coarse chain (co_), exact integer
    * residuals, one residual-PQ chain per subspace (rs{s}_,
    * preQuantized), probe, per-cell residual ADC tables, integer sum.
    * [[ivfPqDetCtes]]/[[ivfPqDetContribs]] are the shared prefix;
    * [[ivfPqDetOracle]] ranks by ADC, [[ivfPqDetRerankOracle]] refines a
    * 50-candidate ADC shortlist with exact integer L2. */
  protected lazy val ivfPqDetParts: (String, String) = {
    val m = 8; val subDim = 8
    val coarse = graft.llm.DetKMeans.oracleCtes("embeddings", "vec_id",
      "embedding", k = 8, iters = 3, dim = 64, prefix = "co_")
    val resCte =
      """
         res AS (SELECT a.id,
             list_transform(range(1, 65), i -> a.u[i] - c.c[i]) AS r
           FROM co_a3 a JOIN co_c2 c USING (cid))"""
    val rsChains = (0 until m).map(s =>
      graft.llm.DetKMeans.oracleCtes("res", "id", "r",
        k = 16, iters = 3, dim = subDim, prefix = s"rs${s}_",
        lead = "", sliceFrom = s * subDim, preQuantized = true))
      .mkString(",\n")
    val probe =
      """
         qu AS (SELECT u FROM co_u0 WHERE id = 0),
         probed AS (SELECT cid, c FROM (
             SELECT c.cid, c.c,
               list_sum(list_transform(range(1, 65),
                 i -> (c.c[i] - q.u[i]) * (c.c[i] - q.u[i]))) AS cqd
             FROM co_c2 c, qu q) x
           ORDER BY cqd, cid LIMIT 2),
         qres AS (SELECT p.cid,
             list_transform(range(1, 65), i -> q.u[i] - p.c[i]) AS qr
           FROM probed p, qu q)"""
    val adcTables = (0 until m).map { s =>
      val off = s * subDim
      s"""
         adc$s AS (SELECT r.cid, cb.cid AS code,
             list_sum(list_transform(range(1, ${subDim + 1}),
               i -> (r.qr[$off + i] - cb.c[i]) * (r.qr[$off + i] - cb.c[i])))
               AS qd
           FROM qres r, rs${s}_c2 cb)"""
    }.mkString(",")
    val contribs = (0 until m).map(s =>
      s"""SELECT a.id, t.qd FROM co_a3 a
          JOIN rs${s}_a3 cd ON a.id = cd.id
          JOIN adc$s t ON t.cid = a.cid AND t.code = cd.cid
          WHERE a.cid IN (SELECT cid FROM probed)""")
      .mkString(" UNION ALL ")
    (coarse + "," + resCte + "," + rsChains + "," + probe + "," + adcTables,
      contribs)
  }
  protected def ivfPqDetCtes: String = ivfPqDetParts._1
  protected def ivfPqDetContribs: String = ivfPqDetParts._2

  protected lazy val ivfPqDetOracle: String = ivfPqDetCtes +
    s"""
       SELECT id AS vec_id, CAST(SUM(qd) AS BIGINT) AS adc_dist
       FROM ($ivfPqDetContribs) all_contribs
       GROUP BY id ORDER BY adc_dist, vec_id LIMIT 10"""

  // IndexRefine over IVFADC: the same generated CTEs rank a 50-candidate
  // shortlist, then exact integer L2 over full-precision unit vectors
  // (the pq_rerank fu/qf formulation) picks the final top-10.
  protected lazy val ivfPqDetRerankOracle: String = ivfPqDetCtes +
    s""",
       adc AS (SELECT id, SUM(qd) AS adc_dist
               FROM ($ivfPqDetContribs) all_contribs
               GROUP BY id ORDER BY adc_dist, id LIMIT 50),
       fu AS (SELECT vec_id AS id,
                list_transform(embedding[1:64],
                  x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                    AS BIGINT)) AS u
              FROM embeddings),
       qf AS (SELECT u FROM fu WHERE id = 0)
       SELECT f.id AS vec_id,
         CAST(list_sum(list_transform(range(1, 65),
           i -> (f.u[i] - q.u[i]) * (f.u[i] - q.u[i]))) AS BIGINT)
           AS exact_dist
       FROM fu f JOIN adc ON f.id = adc.id, qf q
       ORDER BY exact_dist, vec_id LIMIT 10"""
}
