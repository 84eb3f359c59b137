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

/** Aggregation and sketch queries.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryAgg extends RegistryCore {

  protected def agg1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double").as("sum_base_price"),
        (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(22, 6)))
          .cast("double")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-20 corpus tokens via the mergeable Misra–Gries summary
    * ([[graft.operators.HeavyHitters]]). Capacity exceeds the distinct
    * count at test scale, so the summary is exact and oracle-checkable
    * (the approximation contract is pinned in HeavyHittersSpec); the plan
    * partial-aggregates the counter tables map-side before one shuffle —
    * contrast with [[llmVocab]]'s full token groupBy. */
  protected def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val hh = udaf(graft.operators.HeavyHitters.TopKAgg(cap = 4096, k = 20))
    t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .agg(hh(col("token")).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item").as("token"), col("h.cnt").as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
  }

  /** TPC-H Q3 shape: top-10 unshipped-order revenue — join + decimal-exact
    * aggregation + deterministic top-k. */
  protected def agg3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderstatus") === "O")
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(DecimalType(22, 6))).cast("double").as("revenue"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Exact distribution quantiles (interpolated): the summary-statistics
    * surface a data pipeline needs before sketch-based approximations. */
  protected def aggQuantiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_extendedprice, 0.25)").as("p25_price"),
      expr("percentile(l_extendedprice, 0.75)").as("p75_price"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"))

  /** GROUPING SETS completes the multi-level-aggregate family beside
    * cube/rollup: the IRREGULAR set list ((flag, status), (flag), ())
    * that a reporting layer actually asks for (cube would compute the
    * unwanted (status) level too — at 100 TB that is a whole extra
    * shuffle's worth of groups). grouping_id disambiguates levels;
    * money sums go through DECIMAL (exact, order-independent). */
  protected def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("v_lineitem")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
             AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty
         FROM v_lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), ())
         ORDER BY gid, l_returnflag, l_linestatus""")
  }

  // ------------------------------------------------- round 6: graph / layout

  /** Pivot: lineitem quantities cross-tabbed return-flag × line-status
    * (explicit pivot values keep the schema static, the scalable form —
    * dynamic pivot needs a driver-side distinct first). */
  protected def aggPivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(col("l_quantity").cast(DecimalType(22, 6))).cast("double"))
      .orderBy("l_linestatus")

  /** Unpivot (melt) — the INVERSE of [[aggPivot]]: the four lineitem
    * measures stack into (measure, cents) rows via the row-local
    * `stack` generator, then a per-measure profile (n / sum / min /
    * max on exact integer cents). The scalable melt shape: stack is a
    * codegen'd 4-way projection inside the scan stage — no join, no
    * map-explode, no shuffle until the 4-group aggregate (which
    * map-side combines to 4 rows per partition). Wide-to-long is the
    * first move of most feature-audit pipelines, so the profile doubles
    * as a cross-measure QC sweep in one pass. */
  protected def aggUnpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(expr(
        """stack(4,
             'discount',      CAST(floor(l_discount * 100 + 0.5) AS BIGINT),
             'extendedprice', CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
             'quantity',      CAST(floor(l_quantity * 100 + 0.5) AS BIGINT),
             'tax',           CAST(floor(l_tax * 100 + 0.5) AS BIGINT))
           AS (measure, cents)"""))
      .groupBy("measure")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .orderBy("measure")

  /** Rollup: hierarchical subtotals over (returnflag, linestatus) with the
    * grouping-id bitmask — one shuffle computes all three levels. */
  protected def aggRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(22, 6))).cast("double").as("sum_qty"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** Mergeable quantile sketch (custom typed Aggregator): O(k·log n)
    * memory with map-side partial aggregation — the 100 TB answer to
    * sort-buffering exact percentiles. The sketch's raw estimates are
    * merge-tree-DEPENDENT (reduce-side combine follows shuffle fetch
    * order), so surfacing them would break the engine's bit-identical
    * reproducibility contract. The query therefore replays the sketch's
    * ±5% rank-error contract in-plan — the empirical rank of each estimate
    * within its group, checked against the bound — and surfaces only that
    * merge-order-INVARIANT verdict beside the exact percentiles. That
    * also makes the query oracle-checkable: DuckDB replays the exact
    * percentiles and asserts the verdict columns are literally 1. */
  protected def aggSketchQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val sk = udaf(graft.operators.QuantileSketch.SketchAgg(
      k = 200, qs = Seq(0.5, 0.99)))
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val est = li.groupBy("l_returnflag")
      .agg(sk(col("l_extendedprice")).as("est"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
        expr("percentile(l_extendedprice, 0.99)").as("p99_exact"))
      .select(col("l_returnflag"),
        element_at(col("est"), 1).as("p50_sketch"),
        element_at(col("est"), 2).as("p99_sketch"),
        col("p50_exact"), col("p99_exact"))
    li.join(broadcast(est), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(
        (sum(when(col("l_extendedprice") <= col("p50_sketch"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1))).as("r50"),
        (sum(when(col("l_extendedprice") <= col("p99_sketch"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1))).as("r99"),
        first(col("p50_exact")).as("p50x"),
        first(col("p99_exact")).as("p99x"))
      .select(col("l_returnflag"),
        graft.llm.Similarity.roundHalfUp(col("p50x"), 4).as("p50_exact"),
        graft.llm.Similarity.roundHalfUp(col("p99x"), 4).as("p99_exact"),
        when(abs(col("r50") - 0.5) <= 0.05, 1L).otherwise(0L)
          .as("p50_rank_ok"),
        when(abs(col("r99") - 0.99) <= 0.05, 1L).otherwise(0L)
          .as("p99_rank_ok"))
      .orderBy("l_returnflag")
  }

  /** Mergeable HLL distinct-count sketch (Spark's built-in HyperLogLog++,
    * Heule et al. 2013) beside the exact distinct count: at 100 TB the
    * sketch (O(1) registers, max-merge — order- and partition-independent,
    * hence deterministic) is what you run; the exact branch exists here to
    * VERIFY the sketch's rsd contract in-plan. Same oracle pattern as the
    * quantile sketch: the approx value never surfaces (DuckDB's HLL is a
    * different implementation), only the exact counts plus the
    * within-3·rsd verdict the oracle asserts as literal 1. */
  protected def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.05).as("_approx"))
      .select(col("event_type"), col("n_exact"),
        when(abs(col("_approx").cast("double") / col("n_exact").cast("double")
          - 1.0) <= 0.15, 1L).otherwise(0L).as("within_3rsd"))
      .orderBy("event_type")

  /** Count-Min frequency estimates for a probe set (hits and misses)
    * beside the exact counts and the overestimate-only guarantee — the
    * md5-derived positions let DuckDB rebuild the identical counter
    * relation and reproduce every estimate, collisions included. */
  protected def aggCountMin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val counters = graft.operators.CountMinSketch.buildCounters(toks, "tok")
    val probes = Seq("the", "spark", "scan", "gpu", "zzz").toDF("item")
    val exact = toks.groupBy(col("tok").as("item")).agg(count(lit(1)).as("exact"))
    graft.operators.CountMinSketch.estimates(counters, probes, "item")
      .join(exact, Seq("item"), "left")
      .select(col("item"), col("cm_estimate"),
        coalesce(col("exact"), lit(0L)).as("exact"),
        (col("cm_estimate") >= coalesce(col("exact"), lit(0L)))
          .as("overestimate_ok"))
      .orderBy("item")
  }

  /** TPC-H Q5 shape: revenue by nation inside one region through the
    * co-located customer/supplier condition — the 6-relation join plan:
    * fact-side equi-joins shuffle on their keys, the nation/region dims
    * broadcast, revenue sums in DecimalType (order-independent). */
  /** ABC / Pareto classification of brands by revenue (the 80/20
    * inventory-analysis classic, here at 70/90 cuts): brands ranked by
    * exact cent revenue, cumulative share computed over the BOUNDED
    * brand relation (the gains-table window discipline — the corpus
    * never sees a global sort), class A = cum ≤ 70%, B ≤ 90%, C rest.
    * FULLY integer: per-row cents = floor(price·100 + 0.5) summed
    * exactly, share₄ and cum-share₄ truncating; rank ties break by
    * brand for a total order. */
  protected def aggAbc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    val rev = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(sum(col("cents")).as("revenue_cents"))
    val w = Window.orderBy(col("revenue_cents").desc, col("brand"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rev
      .crossJoin(broadcast(rev.agg(sum(col("revenue_cents")).as("tot"))))
      .withColumn("cum_cents", sum(col("revenue_cents")).over(w))
      .select(col("brand"), col("revenue_cents"),
        expr("revenue_cents * 10000 div tot").as("share4"),
        expr("cum_cents * 10000 div tot").as("cum_share4"))
      .withColumn("abc_class",
        expr("CASE WHEN cum_share4 <= 7000 THEN 'A' " +
          "WHEN cum_share4 <= 9000 THEN 'B' ELSE 'C' END"))
      .orderBy(col("revenue_cents").desc, col("brand"))
  }

  /** Exact per-group median at scale via the DOMAIN-BOUNDED value
    * histogram (the third quantile mechanism beside approx_percentile
    * and the mergeable sketch): prices live on a bounded cent grid, so
    * grouping by (flag, cents) yields a relation bounded by
    * |flags|·|price domain| REGARDLESS of corpus size, and the exact
    * lower median is the smallest value whose doubled cumulative count
    * reaches n — no global sort, no corpus-wide window. */
  protected def aggExactMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // widen REJECTED here (r17 A/B: 1.94 -> 2.25 s — the repartition
    // exchange costs more than the single-task partial agg saves; the
    // (flag, cents) grid collapses 600k rows to ~45k pre-shuffle anyway).
    val vc = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("flag", "cents").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("flag").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    vc.withColumn("cum", sum(col("c")).over(w))
      .crossJoin(broadcast(vc.groupBy("flag").agg(sum(col("c")).as("n"))
        .withColumnRenamed("flag", "f2")))
      .filter(col("flag") === col("f2") && lit(2L) * col("cum") >= col("n"))
      .groupBy(col("flag"))
      .agg(max(col("n")).as("n"), min(col("cents")).as("median_cents"))
      .orderBy("flag")
  }

  protected def aggRegionalVolume(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem"); val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer"); val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation"); val r = t(spark, dir, "region")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7 shape: cross-border trade volume between customer and
    * supplier nations — the nation dim joins TWICE under different
    * aliases (both broadcast); output is the full flow matrix. */
  protected def aggTradeFlow(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem"); val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer"); val s = t(spark, dir, "supplier")
    val n = t(spark, dir, "nation")
    val cn = n.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val sn = n.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cnk"))
      .join(broadcast(sn), col("s_nationkey") === col("snk"))
      .groupBy("cust_nation", "supp_nation")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 6))).cast("double").as("volume"),
        count(lit(1)).as("n_lineitems"))
      .orderBy("cust_nation", "supp_nation")
  }

  // ---------------------------------------------------------------- Registry

  // ----------------------------------------------------------- round-8 ops

  /** Relational HLL distinct-count sketch per event type + the 'ALL' row
    * MERGED from the per-type registers (elementwise max — the sketch
    * union law; 'ALL' never rescans the data). Registers are md5-derived
    * so DuckDB rebuilds them identically and replays the estimate to the
    * last bit; the 3·rsd accuracy verdict is pure-integer
    * (1000·|est−exact| ≤ 195·exact + 16000) so no float compare sits on
    * a boundary. */
  /** KMV (k-minimum-values) distinct sketch per event type (Bar-Yossef
    * et al. 2002; the bottom-k sibling of [[sketchHll]] — mergeable by
    * taking the k smallest of a union, and unlike HLL it supports
    * set-intersection estimates natively). Estimate: with h the k-th
    * smallest of the distinct 32-bit md5-prefix hashes,
    * D̂ = (k−1)·2³² div h — fully integer. Scale shape: the per-group
    * bottom-k is row_number over an ORDERED partition + rank filter,
    * which Spark prunes map-side via WindowGroupLimit (plan-pinned for
    * the dedup family) — only ~k candidates per group cross the
    * shuffle, never the distinct-hash relation. Accuracy sanity-bounded
    * in-row against the exact distinct (rsd ≈ 1/√(k−2) ≈ 12.6% at
    * k=64; the pinned bound is 3 rsd). Groups with fewer than k distinct
    * slots have no k-th value and DROP from the output (the inner join)
    * — KMV has no estimate below its own k; both engines drop
    * identically, and PartitionInvarianceSpec pins the semantics at a
    * sub-k scale factor. */
  protected def sketchKmv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 64
    val ev = t(spark, dir, "events").select(col("event_type"), col("user_id"))
    val hashed = ev
      .select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .distinct() // one slot per distinct hash (collisions collapse here)
    val kth = hashed
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("rk") === k)
      .select(col("event_type"), col("h").as("kth_hash"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact_distinct"))
    kth.join(exact, Seq("event_type"))
      .select(col("event_type"), lit(k.toLong).as("k"), col("kth_hash"),
        expr(s"CAST(${k - 1} AS BIGINT) * 4294967296 div kth_hash")
          .as("kmv_estimate"),
        col("exact_distinct"),
        (abs(expr(s"CAST(${k - 1} AS BIGINT) * 4294967296 div kth_hash")
          - col("exact_distinct")) * 1000L
          <= col("exact_distinct") * 381L).as("within_3rsd"))
      .orderBy("event_type")
  }

  /** Theta-sketch set operations (Dasgupta, Lang, Rhodes & Thaler 2016;
    * the KMV estimator is Bar-Yossef et al. 2002) over the (user, day)
    * activity sets of two event types: union and intersection distinct
    * estimates from two bottom-64 sketches ALONE — the composable
    * audience-overlap math a 100 TB profile store runs on sketches it
    * never re-scans. Union: the bottom-64 of the two sketches' merged
    * hash set is exactly the bottom-64 of the underlying set union, so
    * D̂ᵤ = 63·2³² div θᵤ. Intersection: with θᵢ = min(θₐ, θᵦ), the
    * sketch-intersection hashes below θᵢ are a uniform sample of A∩B at
    * rate θᵢ/2³², so D̂ᵢ = c·2³² div θᵢ. Fully integer; md5-prefix
    * hashes rebuild identically in DuckDB; both estimates sit beside
    * their exact counts in-row. The per-set bottom-k is the
    * WindowGroupLimit-pruned rank filter of [[sketchKmv]]. */
  protected def sketchTheta(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 64
    def pairsOf(tp: String): DataFrame =
      t(spark, dir, "events").filter(col("event_type") === tp)
        .select(col("user_id"), expr("ts div 86400000000000").as("day"))
        .distinct()
    def sketchOf(p: DataFrame): DataFrame = p
      .select(conv(substring(md5(concat(col("user_id").cast("string"),
          lit(":"), col("day").cast("string"))), 1, 8), 16, 10)
        .cast("long").as("h"))
      .distinct()
      .withColumn("rk", row_number().over(Window.orderBy("h")))
      .filter(col("rk") <= k)
      .select(col("h"))
    val pa = pairsOf("view").localCheckpoint(true)
    val pb = pairsOf("purchase").localCheckpoint(true)
    val ska = sketchOf(pa).localCheckpoint(true)
    val skb = sketchOf(pb).localCheckpoint(true)
    def kth(s: DataFrame): DataFrame = s
      .withColumn("rk", row_number().over(Window.orderBy("h")))
      .filter(col("rk") === k).select(col("h"))
    val thA = kth(ska).select(col("h").as("theta_a"))
    val thB = kth(skb).select(col("h").as("theta_b"))
    val thU = kth(ska.unionAll(skb).distinct())
      .select(col("h").as("theta_union"))
    val thI = thA.crossJoin(thB)
      .select(least(col("theta_a"), col("theta_b")).as("theta_inter"))
    // global agg (never a groupBy): an empty sketch intersection still
    // yields the one summary row with inter_count = 0
    val interCnt = ska.join(skb, Seq("h")).crossJoin(broadcast(thI))
      .agg(coalesce(sum(when(col("h") < col("theta_inter"), 1L)
        .otherwise(0L)), lit(0L)).as("inter_count"))
    val exactU = pa.unionAll(pb).distinct().agg(count(lit(1)).as("exact_union"))
    val exactI = pa.join(pb, Seq("user_id", "day"))
      .agg(count(lit(1)).as("exact_inter"))
    thA.crossJoin(thB).crossJoin(thU)
      .crossJoin(broadcast(interCnt)).crossJoin(broadcast(exactU))
      .crossJoin(broadcast(exactI))
      .withColumn("theta_inter", least(col("theta_a"), col("theta_b")))
      .select(lit(k.toLong).as("k"), col("theta_a"), col("theta_b"),
        col("theta_union"),
        expr(s"CAST(${k - 1} AS BIGINT) * 4294967296 div theta_union")
          .as("union_est"),
        col("exact_union"), col("theta_inter"), col("inter_count"),
        expr("CAST(inter_count * 4294967296 div theta_inter AS BIGINT)")
          .as("inter_est"),
        col("exact_inter"))
  }

  protected def sketchHll(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").select(col("event_type"), col("user_id"))
    val regs = graft.operators.HllSketch.registers(ev, "event_type", "user_id")
    val withAll = regs.unionByName(graft.operators.HllSketch.merged(regs, "ALL"))
    val exact = ev.groupBy(col("event_type").as("grp"))
      .agg(countDistinct("user_id").as("exact_distinct"))
      .unionByName(ev.agg(countDistinct("user_id").as("exact_distinct"))
        .select(lit("ALL").as("grp"), col("exact_distinct")))
    graft.operators.HllSketch.estimate(withAll)
      .join(exact, Seq("grp"))
      .select(col("grp"), col("n_nonzero"), col("reg_sum"), col("hll_estimate"),
        col("exact_distinct"),
        (abs(col("hll_estimate") - col("exact_distinct")) * 1000L
          <= col("exact_distinct") * 195L + 16000L).as("within_3rsd"))
      .orderBy("grp")
  }

  /** Sketch-space set intersection (audience overlap): |click ∩ view|
    * estimated by inclusion–exclusion over three HLL estimates — the two
    * group sketches plus their register-max union. The point at 100 TB:
    * overlap between ANY two segments comes from KB-sized register files
    * that were built once, with no re-scan and no join of the underlying
    * sets; exactness is sanity-bounded in-row against the true overlap
    * (inclusion–exclusion compounds the per-sketch rsd, hence the wider
    * 3-term bound). */
  protected def sketchHllIntersect(spark: SparkSession, dir: String): DataFrame = {
    // Segments sized for the raw-estimate regime (n ≳ 2.5·m = 640; the
    // registry's m = 256 sketches carry no small-range linear-counting
    // correction, so sub-m sets would estimate poorly): the coarse
    // event-id sets touched by clicks vs by views — ~1800 items each,
    // heavily but not fully overlapping.
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("event_id div 3").as("item"))
    val regs = graft.operators.HllSketch.registers(ev, "event_type", "item")
    val withU = regs.unionByName(graft.operators.HllSketch.merged(regs, "U"))
    val est = graft.operators.HllSketch.estimate(withU)
      .groupBy()
      .agg(
        sum(when(col("grp") === "click", col("hll_estimate"))).as("est_a"),
        sum(when(col("grp") === "view", col("hll_estimate"))).as("est_b"),
        sum(when(col("grp") === "U", col("hll_estimate"))).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("est_intersect"))
    val exact = ev.groupBy("item")
      .agg(countDistinct("event_type").as("nt"))
      .agg(sum(when(col("nt") === 2, 1L).otherwise(0L)).as("exact_intersect"),
        count(lit(1)).as("exact_union"))
    est.crossJoin(broadcast(exact))
      .select(col("est_a"), col("est_b"), col("est_union"),
        col("est_intersect"), col("exact_intersect"),
        (abs(col("est_intersect") - col("exact_intersect")) * 1000L
          <= col("exact_union") * 585L + 48000L).as("within_bound"))
  }

  /** CUBE over (status, order year) with grouping_id — the all-margins
    * dashboard aggregate (rollup's lattice completion). Decimal sums. */
  protected def aggCube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderstatus"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        col("o_totalprice"))
      .cube("o_orderstatus", "o_year")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(22, 6))).cast("double")
          .as("sum_price"),
        grouping_id().as("gid"))
      .orderBy("gid", "o_orderstatus", "o_year")

  /** Exact per-group mode with a deterministic tie-break (smallest
    * modal value) — the categorical "typical value" the mean/median
    * family can't give: modal order quantity per return flag, plus its
    * share. Two aggregates and a per-group struct-min — the
    * grouped-top-1 shape without a window ((count DESC, value ASC)
    * encoded as min over (−count, value)). */
  protected def aggMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .groupBy("l_returnflag", "q").agg(count(lit(1)).as("c"))
    counts.groupBy("l_returnflag")
      .agg(min(struct((-col("c")).as("nc"), col("q").as("q")))
          .as("best"),
        sum(col("c")).as("n"))
      .select(col("l_returnflag"), col("best.q").as("mode_qty"),
        (-col("best.nc")).as("mode_count"),
        expr("CAST((-best.nc) * 10000 div n AS BIGINT)").as("share_bp"))
      .orderBy("l_returnflag")
  }

  /** AMS F₂ sketch (Alon–Matias–Szegedy 1996) — the second-frequency-
    * moment estimator that completes the sketch family (HLL counts
    * distincts = F₀, count-min answers points, AMS answers Σc² — the
    * self-join size, the number a join planner wants BEFORE shuffling):
    * 32 ±1-signed counters from md5 bits (row-local, merge = sum — the
    * mergeability that makes it a one-aggregate distributed pass), 4
    * group means of counter², lower-median of the means, audited
    * against the EXACT Σc² from a per-key aggregate. All integers:
    * signs are exact, squares go through DECIMAL(38,0) (counters top
    * Long-squared at ~10¹⁰ rows), means and the error are truncating
    * divisions. Scale: ONE pass over the corpus (32 codegen'd md5
    * columns per row), one 32-row reduce; the exact side is the usual
    * key aggregate. */
  protected def sketchAmsF2(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = t(spark, dir, "lineitem").select(col("l_partkey"))
    // 32 sign columns in ONE projection (the minhash 32-column
    // precedent) — not an explode, so the corpus pass stays 1×.
    val signs = (0 until 32).map { j =>
      sum((conv(substring(md5(concat_ws(":", lit(j), col("l_partkey"))),
        1, 8), 16, 10).cast("long") % 2 * 2 - 1)).as(s"c$j")
    }
    val counters = li.agg(signs.head, signs.tail: _*)
    val medianEst = counters.select(
        (0 until 4).map { g =>
          (0 until 8).map(i =>
            col(s"c${g * 8 + i}").cast(dec) * col(s"c${g * 8 + i}"))
            .reduce(_ + _).as(s"s$g")
        }: _*)
      .select((0 until 4).map(g =>
        expr(s"CAST(s$g div 8 AS BIGINT)").as(s"m$g")): _*)
      .select(expr("element_at(array_sort(array(m0, m1, m2, m3)), 2)")
        .as("f2_est"))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("c")).cast("long").as("n_rows"),
        sum(col("c").cast(dec) * col("c")).cast("long").as("f2_exact"))
    exact.crossJoin(medianEst)
      .select(col("n_rows"), col("n_distinct"), col("f2_exact"),
        col("f2_est"),
        expr("CASE WHEN f2_exact = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE abs(f2_est - f2_exact) * 10000 div f2_exact END")
          .as("err_bp"))
  }

  /** Herfindahl–Hirschman supplier concentration per nation (the
    * antitrust/market-structure summary; HHI = Σ shareᵢ², 10000 =
    * monopoly) — the per-market companion of [[statsGini]]'s global
    * inequality scalar and [[aggAbc]]'s rank classes: which nations'
    * supply is one-firm fragile? FULLY integer: revenue is exact cents,
    * HHI₄ clears to Σsᵢ²·10⁴ div (Σsᵢ)² — one non-negative truncating
    * division per nation in DECIMAL(38,0)/HUGEINT (sᵢ² tops Long at
    * ~$10M suppliers). The DOJ 2500-point threshold flags concentrated
    * markets. Scale shape: one supplier-keyed revenue aggregate (the
    * only corpus-sized shuffle), one |nations|-bounded reduce. */
  protected def aggHhi(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rev = t(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("l_suppkey").agg(sum(col("cents")).as("s"))
    val bySupp = rev
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey").as("l_suppkey"),
          col("s_nationkey").cast("long").as("nat")), Seq("l_suppkey"))
    bySupp.groupBy("nat")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s").cast(dec)).as("tot"),
        sum(col("s").cast(dec) * col("s")).as("sq"))
      .join(t(spark, dir, "nation")
        .select(col("n_nationkey").cast("long").as("nat"),
          col("n_name")), Seq("nat"))
      .select(col("n_name"), col("n_suppliers"),
        col("tot").cast("long").as("total_cents"),
        expr("CASE WHEN tot = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(sq * 10000 div (tot * tot) AS BIGINT) END")
          .as("hhi4"),
        expr("CASE WHEN tot > 0 AND sq * 10000 >= 2500 * tot * tot" +
          " THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END")
          .as("concentrated"))
      .orderBy("n_name")
  }

  protected val aggOracleSql: ListMap[String, String] = ListMap(
    "q_agg_mode" ->
      """WITH c AS (SELECT l_returnflag,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2),
         b AS (SELECT l_returnflag, q AS mode_qty, c AS mode_count,
             CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT)
               AS n,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY c DESC, q) AS rn
           FROM c)
         SELECT l_returnflag, mode_qty, mode_count,
           mode_count * 10000 // n AS share_bp
         FROM b WHERE rn = 1 ORDER BY l_returnflag""",
    "q_sketch_ams_f2" -> {
      val cols = (0 until 32).map(j =>
        s"""CAST(sum((('0x' || substr(md5('$j:' ||
            CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT % 2) * 2 - 1)
            AS HUGEINT) AS c$j""").mkString(", ")
      val means = (0 until 4).map { g =>
        val sq = (0 until 8).map(i => s"c${g * 8 + i} * c${g * 8 + i}")
          .mkString(" + ")
        s"CAST(($sq) // 8 AS BIGINT) AS m$g"
      }.mkString(", ")
      s"""WITH cnt AS (SELECT $cols FROM lineitem),
         mts AS (SELECT $means FROM cnt),
         med AS (SELECT list_sort([m0, m1, m2, m3])[2] AS f2_est
           FROM mts),
         ex AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(sum(CAST(c AS HUGEINT) * c) AS BIGINT) AS f2_exact
           FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) AS c
                 FROM lineitem GROUP BY 1))
         SELECT n_rows, n_distinct, f2_exact, f2_est,
           CASE WHEN f2_exact = 0 THEN CAST(0 AS BIGINT)
                ELSE abs(f2_est - f2_exact) * 10000 // f2_exact END
             AS err_bp
         FROM ex, med"""
    },
    "q_agg_hhi" ->
      """WITH rev AS (SELECT l_suppkey,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS s
           FROM lineitem GROUP BY 1),
         bs AS (SELECT CAST(s_nationkey AS BIGINT) AS nat,
             CAST(rev.s AS HUGEINT) AS s
           FROM rev JOIN supplier ON rev.l_suppkey = s_suppkey),
         agg AS (SELECT nat, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(s) AS HUGEINT) AS tot,
             CAST(sum(s * s) AS HUGEINT) AS sq
           FROM bs GROUP BY 1)
         SELECT n_name, n_suppliers, CAST(tot AS BIGINT) AS total_cents,
           CAST(CASE WHEN tot = 0 THEN 0
                ELSE sq * 10000 // (tot * tot) END AS BIGINT) AS hhi4,
           CAST(CASE WHEN tot > 0 AND sq * 10000 >= 2500 * tot * tot
                THEN 1 ELSE 0 END AS BIGINT) AS concentrated
         FROM agg JOIN nation ON agg.nat = CAST(n_nationkey AS BIGINT)
         ORDER BY n_name""",
    // Full Count-Min replay: identical md5 positions → identical counter
    // relation → identical estimates, plus the exact counts and the
    // est ≥ exact guarantee evaluated on both engines.
    "q_agg_countmin" ->
      """WITH toks AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
                       FROM documents),
         c AS (SELECT j AS row,
                 ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || tok), 1, 13))::BIGINT
                   % 1024 AS pos,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM toks, range(4) r(j) GROUP BY 1, 2),
         q(item) AS (VALUES ('the'), ('spark'), ('scan'), ('gpu'), ('zzz')),
         p AS (SELECT item, j AS row,
                 ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || item), 1, 13))::BIGINT
                   % 1024 AS pos
               FROM q, range(4) r(j)),
         est AS (SELECT item, min(coalesce(cnt, 0)) AS cm_estimate
                 FROM p LEFT JOIN c USING (row, pos) GROUP BY item),
         ex AS (SELECT tok AS item, CAST(count(*) AS BIGINT) AS exact
                FROM toks GROUP BY tok)
         SELECT q.item, CAST(est.cm_estimate AS BIGINT) AS cm_estimate,
           CAST(coalesce(ex.exact, 0) AS BIGINT) AS exact,
           est.cm_estimate >= coalesce(ex.exact, 0) AS overestimate_ok
         FROM q JOIN est USING (item) LEFT JOIN ex ON q.item = ex.item
         ORDER BY q.item""",
    "q_agg_regional_volume" ->
      """SELECT n_name,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_agg_trade_flow" ->
      """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(22,6))) AS DOUBLE) AS volume,
           count(*) AS n_lineitems
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         WHERE c_nationkey <> s_nationkey
         GROUP BY cn.n_name, sn.n_name ORDER BY cust_nation, supp_nation""",
    // The HLL sketch value never surfaces (engine-specific registers);
    // the oracle replays the exact counts and asserts the in-plan
    // rsd-contract verdict is literally 1 — see aggApproxDistinct.
    "q_agg_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
           CAST(1 AS BIGINT) AS within_3rsd
         FROM events GROUP BY event_type ORDER BY event_type""",
    // Sketch estimates never surface (merge-tree-dependent); the query
    // emits the exact percentiles (4dp half-up) plus in-plan rank-error
    // verdicts the oracle asserts as literal 1 — see aggSketchQuantiles.
    "q_agg_sketch_quantiles" ->
      """SELECT l_returnflag,
           floor(quantile_cont(l_extendedprice, 0.5) * 10000 + 0.5) / 10000
             AS p50_exact,
           floor(quantile_cont(l_extendedprice, 0.99) * 10000 + 0.5) / 10000
             AS p99_exact,
           CAST(1 AS BIGINT) AS p50_rank_ok, CAST(1 AS BIGINT) AS p99_rank_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_agg1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
           count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    // Exact because cap=4096 > distinct tokens: no purge ever fires. The
    // CASE mirrors tokens()'s empty-text -> empty-array contract (raw
    // string_split_regex would emit a phantom '' token per empty doc).
    "q_agg_heavy_hitters" ->
      """SELECT token, count(*) AS freq
         FROM (SELECT unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                 ELSE string_split_regex(trim(text), '\s+') END) AS token
               FROM documents)
         GROUP BY token ORDER BY freq DESC, token LIMIT 20""",
    "q_agg3_top_revenue" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderstatus = 'O'
         GROUP BY o_orderkey, o_orderdate
         ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""",
    "q_agg_quantiles" ->
      """SELECT quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.75) AS p75_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
         FROM lineitem""",
    "q_agg_pivot" ->
      """SELECT l_linestatus,
              CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(22,6)) END) AS DOUBLE) AS "A",
              CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(22,6)) END) AS DOUBLE) AS "N",
              CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(22,6)) END) AS DOUBLE) AS "R"
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_agg_unpivot" ->
      """WITH m AS (
           SELECT 'discount' AS measure,
                  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS cents
           FROM lineitem
           UNION ALL SELECT 'extendedprice',
                  CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
           FROM lineitem
           UNION ALL SELECT 'quantity',
                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
           FROM lineitem
           UNION ALL SELECT 'tax',
                  CAST(floor(l_tax * 100 + 0.5) AS BIGINT)
           FROM lineitem)
         SELECT measure, count(*) AS n,
                CAST(sum(cents) AS BIGINT) AS sum_cents,
                min(cents) AS min_cents, max(cents) AS max_cents
         FROM m GROUP BY measure ORDER BY measure""",
    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
              CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty,
              GROUPING(l_returnflag, l_linestatus) AS gid
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY gid, l_returnflag, l_linestatus""",
    // Full register replay: md5-derived index/rank, per-type registers,
    // the 'ALL' row merged by elementwise max (the union law), and the
    // one-IEEE-division estimate. The verdict is pure integer.
    "q_sketch_hll" ->
      """WITH it AS (SELECT event_type AS grp, CAST(user_id AS VARCHAR) AS item
                     FROM events),
         h AS (SELECT grp,
                 ('0x' || substr(md5(item), 1, 2))::BIGINT AS reg,
                 ('0x' || substr(md5(item), 3, 8))::BIGINT AS v
               FROM it),
         r0 AS (SELECT grp, reg,
                  CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END AS rho
                FROM h),
         regs AS (SELECT grp, reg, MAX(rho) AS rho FROM r0 GROUP BY grp, reg),
         rr AS (SELECT * FROM regs
                UNION ALL
                SELECT 'ALL' AS grp, reg, MAX(rho) AS rho FROM regs GROUP BY reg),
         est AS (SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n_nonzero,
                   CAST(SUM(rho) AS BIGINT) AS reg_sum,
                   CAST(floor(
                     CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
                       + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
                     * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE)
                     * CAST(8589934592 AS DOUBLE)
                     / CAST((256 - COUNT(*)) * 8589934592
                         + SUM(CAST(power(2.0, 33 - rho) AS BIGINT)) AS DOUBLE))
                     AS BIGINT) AS hll_estimate
                 FROM rr GROUP BY grp),
         ex AS (SELECT event_type AS grp,
                  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
                FROM events GROUP BY 1
                UNION ALL
                SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
         SELECT grp, n_nonzero, reg_sum, hll_estimate, exact_distinct,
           abs(hll_estimate - exact_distinct) * 1000
             <= exact_distinct * 195 + 16000 AS within_3rsd
         FROM est JOIN ex USING (grp) ORDER BY grp""",
    // Register building and estimate replay exactly as q_sketch_hll; the
    // inclusion-exclusion is three replayed estimates and a subtraction.
    "q_sketch_hll_intersect" ->
      """WITH it AS (SELECT event_type AS grp,
                  CAST(event_id // 3 AS VARCHAR) AS item
               FROM events WHERE event_type IN ('click', 'view')),
         h AS (SELECT grp,
                 ('0x' || substr(md5(item), 1, 2))::BIGINT AS reg,
                 ('0x' || substr(md5(item), 3, 8))::BIGINT AS v
               FROM it),
         r0 AS (SELECT grp, reg,
                  CASE WHEN v = 0 THEN 33 ELSE 33 - length(bin(v)) END AS rho
                FROM h),
         regs AS (SELECT grp, reg, MAX(rho) AS rho FROM r0 GROUP BY grp, reg),
         rr AS (SELECT * FROM regs
                UNION ALL
                SELECT 'U' AS grp, reg, MAX(rho) AS rho FROM regs GROUP BY reg),
         est AS (SELECT grp,
                   CAST(floor(
                     CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
                       + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
                     * CAST(256.0 AS DOUBLE) * CAST(256.0 AS DOUBLE)
                     * CAST(8589934592 AS DOUBLE)
                     / CAST((256 - COUNT(*)) * 8589934592
                         + SUM(CAST(power(2.0, 33 - rho) AS BIGINT)) AS DOUBLE))
                     AS BIGINT) AS hll_estimate
                 FROM rr GROUP BY grp),
         e1 AS (SELECT
             CAST(sum(CASE WHEN grp = 'click' THEN hll_estimate END) AS BIGINT)
               AS est_a,
             CAST(sum(CASE WHEN grp = 'view' THEN hll_estimate END) AS BIGINT)
               AS est_b,
             CAST(sum(CASE WHEN grp = 'U' THEN hll_estimate END) AS BIGINT)
               AS est_union
           FROM est),
         ex AS (SELECT
             CAST(sum(CASE WHEN nt = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_intersect,
             CAST(count(*) AS BIGINT) AS exact_union
           FROM (SELECT item, count(DISTINCT grp) AS nt
                 FROM it GROUP BY item))
         SELECT est_a, est_b, est_union,
           est_a + est_b - est_union AS est_intersect,
           exact_intersect,
           abs(est_a + est_b - est_union - exact_intersect) * 1000
             <= exact_union * 585 + 48000 AS within_bound
         FROM e1, ex""",
    "q_agg_cube" ->
      """WITH o AS (SELECT o_orderstatus,
                      CAST(year(o_orderdate) AS BIGINT) AS o_year,
                      o_totalprice
                    FROM orders)
         SELECT o_orderstatus, o_year, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(22,6))) AS DOUBLE)
             AS sum_price,
           GROUPING(o_orderstatus, o_year) AS gid
         FROM o GROUP BY CUBE (o_orderstatus, o_year)
         ORDER BY gid, o_orderstatus, o_year""",
    // Grouping-sets replay: same irregular level list, same explicit
    // grouping() bit composition (engine-neutral, unlike GROUPING_ID
    // whose bit order is dialect-defined).
    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
             AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sum_qty
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           (l_returnflag), ())
         ORDER BY gid, l_returnflag, l_linestatus""",
    // KMV replay: same distinct md5-prefix slots, same k-th rank pick,
    // same integer estimate and 3-rsd sanity bound.
    "q_sketch_kmv" ->
      """WITH hashed AS (SELECT DISTINCT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               AS h
           FROM events),
         kth AS (SELECT event_type, h AS kth_hash FROM (
             SELECT event_type, h, row_number() OVER (
               PARTITION BY event_type ORDER BY h) AS rk FROM hashed)
           WHERE rk = 64),
         ex AS (SELECT event_type,
                  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
                FROM events GROUP BY 1)
         SELECT kth.event_type, CAST(64 AS BIGINT) AS k, kth_hash,
           CAST(63 * 4294967296 // kth_hash AS BIGINT) AS kmv_estimate,
           exact_distinct,
           abs(63 * 4294967296 // kth_hash - exact_distinct) * 1000
             <= exact_distinct * 381 AS within_3rsd
         FROM kth JOIN ex ON kth.event_type = ex.event_type
         ORDER BY kth.event_type""",
    // Theta replay: same distinct (user, day) sets, same md5-prefix
    // bottom-64 sketches, same θ picks and integer estimates.
    "q_sketch_theta" ->
      """WITH pa AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day
           FROM events WHERE event_type = 'view'),
         pb AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day
           FROM events WHERE event_type = 'purchase'),
         ha AS (SELECT DISTINCT ('0x' || substr(md5(
             CAST(user_id AS VARCHAR) || ':' || CAST(day AS VARCHAR)),
             1, 8))::BIGINT AS h FROM pa),
         hb AS (SELECT DISTINCT ('0x' || substr(md5(
             CAST(user_id AS VARCHAR) || ':' || CAST(day AS VARCHAR)),
             1, 8))::BIGINT AS h FROM pb),
         ska AS (SELECT h FROM (SELECT h,
             row_number() OVER (ORDER BY h) AS rk FROM ha) WHERE rk <= 64),
         skb AS (SELECT h FROM (SELECT h,
             row_number() OVER (ORDER BY h) AS rk FROM hb) WHERE rk <= 64),
         tha AS (SELECT h AS theta_a FROM (SELECT h,
             row_number() OVER (ORDER BY h) AS rk FROM ska) WHERE rk = 64),
         thb AS (SELECT h AS theta_b FROM (SELECT h,
             row_number() OVER (ORDER BY h) AS rk FROM skb) WHERE rk = 64),
         thu AS (SELECT h AS theta_union FROM (SELECT h,
             row_number() OVER (ORDER BY h) AS rk FROM (
               SELECT DISTINCT h FROM (SELECT h FROM ska
                 UNION ALL SELECT h FROM skb))) WHERE rk = 64),
         ic AS (SELECT CAST(COALESCE(sum(CASE
                 WHEN s.h < LEAST(theta_a, theta_b) THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS inter_count
             FROM ska s JOIN skb USING (h), tha, thb),
         eu AS (SELECT CAST(count(*) AS BIGINT) AS exact_union FROM (
             SELECT DISTINCT user_id, day FROM (
               SELECT * FROM pa UNION ALL SELECT * FROM pb))),
         ei AS (SELECT CAST(count(*) AS BIGINT) AS exact_inter
                FROM pa JOIN pb USING (user_id, day))
         SELECT CAST(64 AS BIGINT) AS k, theta_a, theta_b, theta_union,
           CAST(63 * 4294967296 // theta_union AS BIGINT) AS union_est,
           exact_union, LEAST(theta_a, theta_b) AS theta_inter,
           inter_count,
           CAST(inter_count * 4294967296 // LEAST(theta_a, theta_b)
             AS BIGINT) AS inter_est,
           exact_inter
         FROM tha, thb, thu, ic, eu, ei""",
    // ABC replay: exact cent revenue, the same bounded-brand cumulative
    // window, truncating shares, 70/90 class cuts.
    "q_agg_abc" ->
      """WITH rev AS (SELECT p.p_brand AS brand,
             CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
               AS BIGINT)) AS BIGINT) AS revenue_cents
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           GROUP BY 1),
         tt AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot
                FROM rev),
         cm AS (SELECT brand, revenue_cents,
             CAST(sum(revenue_cents) OVER (
               ORDER BY revenue_cents DESC, brand
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_cents
           FROM rev)
         SELECT brand, revenue_cents,
           revenue_cents * 10000 // tot AS share4,
           cum_cents * 10000 // tot AS cum_share4,
           CASE WHEN cum_cents * 10000 // tot <= 7000 THEN 'A'
                WHEN cum_cents * 10000 // tot <= 9000 THEN 'B'
                ELSE 'C' END AS abc_class
         FROM cm, tt ORDER BY revenue_cents DESC, brand""",
    // Exact-median replay: the identical domain-bounded cent histogram,
    // per-flag cumulative, smallest value with doubled cum >= n.
    "q_agg_exact_median" ->
      """WITH vc AS (SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2),
         cm AS (SELECT flag, cents, c,
             CAST(sum(c) OVER (PARTITION BY flag ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM vc),
         nn AS (SELECT flag, CAST(sum(c) AS BIGINT) AS n FROM vc
                GROUP BY 1)
         SELECT cm.flag, max(nn.n) AS n, min(cents) AS median_cents
         FROM cm JOIN nn ON cm.flag = nn.flag
         WHERE 2 * cum >= n GROUP BY cm.flag ORDER BY cm.flag""",
  )
}
