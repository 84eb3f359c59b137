package graft

import org.apache.spark.sql.SparkSession

/** Anchor benchmark (judge directive r16 item 3): a PINNED ~40-query
  * subset run in a FRESH JVM (invoke via `scripts/runmain.sh
  * graft.AnchorBench`, 8 g heap default) so cross-round per-query
  * numbers carry no registry-size JIT/codegen confound — the full
  * [[Bench]] showed a uniform +14 % drift on byte-identical sources
  * r14→r15 precisely because 24 extra queries' codegen/JIT pressure
  * taxes every earlier query in a shared JVM. The subset is frozen
  * (append-only, never renamed) and spans: the round-14 six, one query
  * per operator family, one per native Catalyst expression, and the
  * five heaviest bench classes — so a regression anywhere in the
  * engine's hot paths moves at least one anchor.
  *
  * Verdict rule: QUIET START REQUIRED — the first 1-min loadavg sample
  * decides `tainted` (the r15 lesson: min-of-samples absorbed a 13.9
  * start). Output: one compact stdout line + a full-map entry appended
  * to bench_history.jsonl tagged `"anchor":true`; benchdiff compares
  * anchor entries only against anchor entries (same-sf rule applies). */
object AnchorBench {

  /** Frozen anchor set. APPEND-ONLY: removing or renaming an entry
    * breaks the cross-round series (AnchorBenchSpec pins membership). */
  val anchors: Seq[String] = Seq(
    // the round-14 six
    "q_d8_group_category", "q_j1_lateral_top1", "q_agg1_pricing_summary",
    "q_llm_ann_brute", "q_llm_exact_dedup", "q_graph_pagerank",
    // one per operator family
    "q_s1_csv_roundtrip", "q_s2_xlsx_read", "q_s3_xls_read",
    "q_h1_header_detect", "q_p5_validate_quarantine",
    "q_d1_dedup_first_wins", "q_j_broadcast_dims", "q_o1_latest",
    "q_u1_upsert", "q_w_running_total", "q_fee_flagship",
    "q_agg_heavy_hitters", "q_stats_tost", "q_ts_dtw",
    "q_ts_perm_entropy", "q_e_shapley_attribution", "q_mm_phash",
    "q_mm_vad", "q_sketch_hll_intersect", "q_exp_srm",
    "q_gov_cl_diversity",
    // one per native Catalyst expression
    "q_llm_bpe", "q_llm_compress_ratio", "q_llm_decontaminate",
    "q_llm_pii_scrub", "q_llm_cdc_chunks", "q_llm_ngram_jaccard",
    "q_llm_langid", "q_llm_ann_pq", "q_layout_hilbert",
    "q_llm_er_linkage", "q_llm_nfc",
    // the heavy classes (iterative graph, banded dedup, IVF-PQ)
    "q_graph_ktruss", "q_graph_betweenness", "q_llm_semdedup",
    "q_llm_minhash_neardup", "q_llm_ann_ivfpq_rerank")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val missing = anchors.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown anchors: ${missing.mkString(", ")}")
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val load0 = loadavg() // BEFORE session build: the quiet-start gate
    val spark = Sessions.local(defaultCpus = 32)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => }
    try graft.queries.Registry.warmSharedStore(spark)
    catch { case _: Throwable => }
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[anchor] $name FAILED: ${e.getMessage}")
        -1.0
      } finally spark.catalog.clearCache()
    }
    // Two suite-interleaved passes, per-query MIN — same estimator as
    // Bench so anchor numbers are methodology-comparable.
    val pass1 = anchors.map(n => n -> once(n)).toMap
    val load1 = loadavg()
    val results = anchors.map { n =>
      val a = pass1(n)
      n -> (if (a < 0) a else { val b = once(n); if (b < 0) -1.0 else math.min(a, b) })
    }
    val load2 = loadavg()
    val loadMax = sys.env.get("SPARK_GRAFT_LOAD_MAX").map(_.toDouble)
      .getOrElse(4.0)
    val tainted = load0 > loadMax
    if (tainted)
      System.err.println(f"[anchor] loadavg-tainted: HOT START (first " +
        f"sample $load0%.1f > $loadMax%.1f) - anchor runs REQUIRE a " +
        "quiet start; discard and re-run")
    else
      System.err.println(f"[anchor] loadavg verdict: quiet " +
        f"(first sample $load0%.1f <= $loadMax%.1f)")
    def compact(v: Double, scale: Int): String =
      if (v < 0) "-1"
      else new java.math.BigDecimal(v)
        .setScale(scale, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros().toPlainString
    val ok = results.filter(_._2 >= 0)
    val total = if (ok.nonEmpty) ok.map(_._2).sum else 0.0
    val failed = results.count(_._2 < 0)
    val qs = results.map { case (k, v) =>
      "\"" + Bench.benchKey(k) + "\":" + compact(v, 2)
    }.mkString("{", ",", "}")
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"anchor","value":${compact(total, 2)},"unit":"sec","n_queries":${results.size},"failed":$failed,"queries":$qs,"loadavg":[${compact(load0, 1)},${compact(load1, 1)},${compact(load2, 1)}]${if (tainted) ""","tainted":true""" else ""},"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"anchor","anchor":true,"value":$total,"unit":"sec","queries":$fullQs,"failed":$failed,"loadavg":[$load0,$load1,$load2],"tainted":$tainted,"sf":"$sfDir","ts":${System.currentTimeMillis / 1000}}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_history.jsonl"),
      (fullLine + "\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    catch { case e: Throwable =>
      System.err.println(s"[anchor] history append failed: ${e.getMessage}") }
    spark.stop()
    println(line)
  }
}
