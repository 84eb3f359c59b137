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

/** Statistical tests and diagnostics.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryStats extends RegistryAgg {

  /** Equi-DEPTH histogram via broadcast percentile thresholds — the
    * complement of [[statsHistogram]]'s equi-width bins, and the shape
    * that avoids the global ntile sort: exact quartile boundaries compute
    * in one aggregate (the proven percentile/quantile_cont pairing on
    * integer cents), broadcast back, and binning is a row-local CASE.
    * Counts land within ±ties of n/4 by construction. */
  protected def statsHistogramEqdepth(spark: SparkSession, dir: String): DataFrame = {
    // widen: the sf0.1 lineitem is ONE parquet split, so the exact
    // percentile() buffers the whole column in ONE task (3.2 s); spread
    // the narrow cents column so the partial buffers build 32-way
    // (no-op at a many-file 100 TB scan — guide §2.5).
    val l = widen(t(spark, dir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c")))
    // ONE array-percentile aggregate (three scalar percentile() aggs each
    // buffer the column independently — measured 3× the cost).
    val qs = l.agg(expr("percentile(c, array(0.25D, 0.5D, 0.75D))").as("qa"))
      .select(floor(element_at(col("qa"), 1) + 0.5).cast("long").as("q1"),
        floor(element_at(col("qa"), 2) + 0.5).cast("long").as("q2"),
        floor(element_at(col("qa"), 3) + 0.5).cast("long").as("q3"))
    l.crossJoin(broadcast(qs))
      .select(when(col("c") <= col("q1"), 0L)
        .when(col("c") <= col("q2"), 1L)
        .when(col("c") <= col("q3"), 2L).otherwise(3L).as("bin"), col("c"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("c").as("lo_cents"),
        max("c").as("hi_cents"))
      .orderBy("bin")
  }

  /** Exact binomial sign tests with Benjamini–Hochberg FDR control
    * (Benjamini & Hochberg 1995) — the multiple-testing layer the
    * single-test family (Welch, ranksum, signed-rank…) needs before
    * anyone reads k simultaneous p-values: per event type, a two-sided
    * SIGN test of morning-vs-evening asymmetry (per 31-phase day fold:
    * positive when hours 0–11 out-count hours 12–23, ties dropped;
    * the fold keeps n ≤ 31 data-INDEPENDENTLY, so 2ⁿ stays in BIGINT
    * at any corpus size), then BH at α = 0.05 across the type universe.
    * EVERYTHING is exact integer arithmetic: p = 2·Σ_{j≤min(k,n−k)}
    * C(n,j) / 2ⁿ with the binomial prefix sums folded by the integer
    * recurrence C(n,j) = C(n,j−1)(n−j+1)/j (each prefix product IS a
    * binomial, so the in-order `div` never truncates); cross-test
    * p-value comparison clears denominators to the common 2³¹ scale,
    * and the BH condition p ≤ i·α/M becomes 20·M·p_scaled ≤ i·2³¹ —
    * no float p-value anywhere, so the oracle replays bit-for-bit
    * (via HUGEINT factorials instead of the recurrence — same exact
    * integers by a different route). The rank window runs over the
    * ≤|event-type-universe| test relation (bounded builder). */
  protected def statsSignBh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val pairs = t(spark, dir, "events")
      .select(col("event_type"),
        expr(s"(ts div $dayNs) % 31").as("ph"),
        (expr(s"(ts div $hourNs) % 24") < 12).as("am"))
      .groupBy("event_type", "ph")
      .agg(sum(when(col("am"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("am"), 1L).otherwise(0L)).as("b"))
    // Ties contribute nothing, but an ALL-ties type must still occupy a
    // BH slot with p = 1 (dropping it would shrink M and loosen every
    // other test's threshold) — so count informative pairs inside the
    // aggregate instead of filtering rows away first.
    val tests = pairs.groupBy("event_type")
      .agg(sum(when(col("a") =!= col("b"), 1L).otherwise(0L)).as("n"),
        sum(when(col("a") > col("b"), 1L).otherwise(0L)).as("k"))
    val withP = tests
      .withColumn("m", least(col("k"), col("n") - col("k")))
      .withColumn("s_m", expr(
        """CASE WHEN m = 0 THEN CAST(1 AS BIGINT) ELSE aggregate(
             sequence(1, CAST(m AS INT)),
             named_struct('c', CAST(1 AS BIGINT), 's', CAST(1 AS BIGINT)),
             (acc, j) -> named_struct(
               'c', acc.c * (n - j + 1) div j,
               's', acc.s + acc.c * (n - j + 1) div j),
             acc -> acc.s) END"""))
      .withColumn("den", expr("shiftleft(CAST(1 AS BIGINT), CAST(n AS INT))"))
      .withColumn("pn", least(lit(2L) * col("s_m"), col("den")))
      .withColumn("p_scaled",
        expr("pn * shiftleft(CAST(1 AS BIGINT), CAST(31 - n AS INT))"))
    val ranked = withP
      .crossJoin(broadcast(withP.agg(count(lit(1)).as("mt"))))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("p_scaled"), col("event_type"))).cast("long"))
      .withColumn("cond", lit(20L) * col("mt") * col("p_scaled") <=
        col("rk") * expr("shiftleft(CAST(1 AS BIGINT), 31)"))
    ranked
      .crossJoin(broadcast(
        ranked.agg(max(when(col("cond"), col("rk"))).as("cut"))))
      .select(col("event_type"), col("n"), col("k"), col("pn"), col("den"),
        expr("p_scaled * 1000000 div shiftleft(CAST(1 AS BIGINT), 31)")
          .as("p6"),
        col("rk").as("bh_rank"),
        when(col("rk") <= coalesce(col("cut"), lit(0L)), 1L).otherwise(0L)
          .as("reject"))
      .orderBy("bh_rank")
  }

  /** Gini coefficient of customer revenue concentration — the inequality
    * summary a sampling/quota design consults before stratifying ("do 1%
    * of customers carry half the spend"). Exactness: revenues are exact
    * integer cents; G·n·Σx clears to 2·Σrᵢxᵢ − (n+1)·Σx in
    * DECIMAL(38,0) with ONE double division floored to 6 dp. The global
    * sort rank uses NO corpus-wide window: rows range-shard by the
    * value's high bits (v div 2²⁰), ranks compose a within-bucket
    * row_number (unique (v, custkey) order) with a prefix offset over
    * the BOUNDED per-bucket count relation — the epoch-shuffle two-pass
    * pattern applied to a value ordering. */
  protected def statsGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val rev = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("v"))
      .withColumn("bk", expr("v div 1048576"))
    val offs = rev.groupBy("bk").agg(count(lit(1)).as("c"))
      .withColumn("off", coalesce(sum(col("c")).over(
        Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val ranked = rev
      .withColumn("ri", row_number().over(
        Window.partitionBy("bk").orderBy(col("v"), col("o_custkey"))))
      .join(offs.select(col("bk"), col("off")), Seq("bk"))
      .select(col("v"), (col("off") + col("ri")).as("r"))
    ranked.agg(count(lit(1)).as("n"), sum(col("v").cast(dec)).as("sx"),
        sum(col("r").cast(dec) * col("v")).as("srx"))
      .select(col("n"),
        (col("sx").cast("double") / 100).as("total_revenue"),
        (floor((lit(2).cast(dec) * col("srx")
            - (col("n").cast(dec) + 1) * col("sx")).cast("double")
          / (col("n").cast(dec) * col("sx")).cast("double")
          * 1e6) / 1e6).as("gini6"))
  }

  /** Cohen's κ (Cohen 1960) between the SAME two in-engine document
    * classifiers McNemar compares — the Gopher format gate and the
    * heuristic quality score at 0.5 — answering the complementary
    * question: McNemar asks "is one systematically stricter?", κ asks
    * "how much do they agree beyond chance?" (the inter-rater number a
    * labeling pipeline reports before trusting either filter alone).
    * FULLY integer: with n docs, g_pos/q_pos positive counts and
    * `agree` concordant pairs, p_o = agree/n and
    * p_e = (g_pos·q_pos + g_neg·q_neg)/n², so
    * κ = (agree·n − pe_num) / (n² − pe_num) with
    * pe_num = g_pos·q_pos + (n−g_pos)·(n−q_pos) — one corpus pass, one
    * micro division, n² = pe_num (a constant classifier) degenerates to
    * 0 on both engines. */
  protected def statsKappa(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(TextAnalysis.gopherPass(col("text")).as("gp"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("qp"))
    d.agg(count(lit(1)).as("n"),
        sum(when(col("gp"), 1L).otherwise(0L)).as("g_pos"),
        sum(when(col("qp"), 1L).otherwise(0L)).as("q_pos"),
        sum(when(col("gp") === col("qp"), 1L).otherwise(0L)).as("agree"))
      .select(col("n"), col("g_pos"), col("q_pos"), col("agree"),
        expr("agree * 1000000 div n").as("po_micro"),
        expr("(g_pos * q_pos + (n - g_pos) * (n - q_pos)) * 1000000" +
          " div (n * n)").as("pe_micro"),
        expr("CASE WHEN n * n = g_pos * q_pos + (n - g_pos) * (n - q_pos)" +
          " THEN 0 ELSE (agree * n - (g_pos * q_pos + (n - g_pos)" +
          " * (n - q_pos))) * 1000000 div (n * n - (g_pos * q_pos" +
          " + (n - g_pos) * (n - q_pos))) END").as("kappa_micro"))
  }

  /** Top-20 bivariate Mahalanobis outliers over (quantity, price) —
    * the correlation-aware outlier score a univariate z-test cannot
    * give (a cheap-but-huge order is normal on each axis separately,
    * anomalous jointly; Mahalanobis 1936). Exactness: centi-unit
    * integers; the scatter terms A = nΣxx−(Σx)², B = nΣxy−ΣxΣy,
    * C = nΣyy−(Σy)² and the cleared-denominator residuals
    * u = nx−Σx, v = ny−Σy are EXACT DECIMAL(38,0); d² = (n−1)·
    * (Cu² − 2Buv + Av²) / (n·(AC−B²)), assembled on ONE double
    * surface in fixed op order, floored 4 dp (the C·u² products pass
    * 10³⁸, so the final assembly is mirrored doubles — the
    * [[statsCorr]] discipline). Scale shape: one scan for the moment
    * aggregate (broadcast back), one scan for scoring, TakeOrdered
    * top-20 with (d² desc, orderkey, linenumber) total tiebreak. */
  protected def statsMahalanobis(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        floor(col("l_quantity") * 100 + 0.5).cast(dec).as("x"),
        floor(col("l_extendedprice") * 100 + 0.5).cast(dec).as("y"))
    val m0 = li.agg(count(lit(1)).cast(dec).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("x")).cast(dec)).as("sxx"),
      sum((col("y") * col("y")).cast(dec)).as("syy"),
      sum((col("x") * col("y")).cast(dec)).as("sxy"))
    // Scatter terms A/B/C and the double surfaces are CONSTANTS of the
    // moment row: compute them once here (same DECIMAL ops, same cast)
    // instead of re-running six DECIMAL(38,0) multiplies per scored row
    // — per-row work drops to the two u/v residual multiplies.
    val m = m0.select(col("n"), col("sx"), col("sy"),
      expr("CAST(n AS DOUBLE)").as("nd"),
      expr("CAST(n * syy - sy * sy AS DOUBLE)").as("cyy"),
      expr("CAST(n * sxy - sx * sy AS DOUBLE)").as("cxy"),
      expr("CAST(n * sxx - sx * sx AS DOUBLE)").as("cxx"))
    li.crossJoin(broadcast(m))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("x").cast("long").as("x_centi"),
        col("y").cast("long").as("y_centi"),
        expr("""floor(
          (nd - 1.0) * (
              cyy
                * CAST(n * x - sx AS DOUBLE) * CAST(n * x - sx AS DOUBLE)
            - 2.0 * cxy
                * CAST(n * x - sx AS DOUBLE) * CAST(n * y - sy AS DOUBLE)
            + cxx
                * CAST(n * y - sy AS DOUBLE) * CAST(n * y - sy AS DOUBLE))
          / (nd * ((cxx * cyy) - cxy * cxy))
          * 10000) / 10000""").as("md2_4dp"))
      .orderBy(col("md2_4dp").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)
  }

  /** Market-basket association rules (Agrawal & Srikant 1994's
    * support / confidence framing plus lift) over order baskets at the
    * brand grain — the co-purchase question the retail side of the
    * reference's order data exists to answer: "orders containing brand
    * A also contain brand B". Basket membership is set semantics
    * (DISTINCT (order, brand)); rules are DIRECTIONAL (both
    * orientations scored); conf₄ = pair·10⁴ div n(ant), and lift is
    * the NESTED truncating surface lift₄ = conf₄·N div n(cons) —
    * exactly conf/P(cons) with confidence pre-truncated to 4dp, which
    * keeps every intermediate in Long (conf₄·N ≤ 10⁴·N, no
    * DECIMAL/HALF_UP divergence between engines) and is replayed
    * op-for-op by the oracle; min-support 20, top-20 by
    * (lift₄ desc, ant, cons) — a total order. Scale shape: the
    * dimension join broadcasts `part`; ONE shuffle on orderkey folds
    * each basket to its distinct brand set (bounded by the brand
    * universe, so the row is small no matter how many lines the order
    * has) and fans out pairs MAP-SIDE via a double explode (fanout ≤
    * brands-per-basket², never corpus²) — no self-join; the four
    * consumers of the basket relation (pair counts, two brand-count
    * broadcasts, the 1-row basket total) share the orderkey shuffle
    * via AQE's runtime stage reuse (measured: the whole query runs in
    * ~2× one basket pass, and beats an eager localCheckpoint 1.4 s vs
    * 2.6 s at sf0.1), and the final top-20 is a
    * TakeOrderedAndProject. */
  protected def mbAssocRules(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val p = t(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    val baskets = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_orderkey").as("ok"))
      .agg(collect_set(col("p_brand")).as("bs"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    val bc = baskets.select(explode(col("bs")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("bn"))
    val pairs = baskets
      .select(explode(col("bs")).as("ant"), col("bs"))
      .select(col("ant"), explode(col("bs")).as("cons"))
      .filter(col("ant") =!= col("cons"))
      .groupBy("ant", "cons")
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= 20)
    pairs
      .join(broadcast(bc.select(col("b").as("ant"), col("bn").as("ant_n"))),
        Seq("ant"))
      .join(broadcast(bc.select(col("b").as("cons"), col("bn").as("cons_n"))),
        Seq("cons"))
      .crossJoin(broadcast(nb))
      .select(col("ant"), col("cons"), col("pair_n"),
        expr("pair_n * 10000 div ant_n").as("conf4"),
        expr("(pair_n * 10000 div ant_n) * n_baskets div cons_n")
          .as("lift4"))
      .orderBy(col("lift4").desc, col("ant"), col("cons"))
      .limit(20)
  }

  /** Block-jackknife standard error of the mean — the cheap distributed
    * uncertainty estimate (delete-one-block jackknife over 32 md5
    * buckets; the one-pass cousin of the Poisson bootstrap Chamandy's
    * "Estimating Uncertainty for Massive Data Streams" popularized at
    * scale): every leave-one-block-out mean is the exact integer
    * ((S−S_i)·10⁶) div (N−n_i), and SE clears denominators to
    * √(31·(32·Σm_i² − (Σm_i)²)) / 32 — exact DECIMAL(38,0) under ONE
    * sqrt. One md5-bucketed aggregate pass; the 32-row combine is
    * broadcast-sized. */
  protected def statsJackknife(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val b = 32
    val rows = t(spark, dir, "lineitem").select(
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("x"),
      pmod(conv(substring(md5(concat(col("l_orderkey").cast("string"),
        lit(":"), col("l_linenumber").cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(b.toLong)).as("bk"))
    val per = rows.groupBy("bk")
      .agg(count(lit(1)).as("ni"), sum(col("x")).as("si"))
    val tot = per.agg(sum(col("ni")).as("n"), sum(col("si")).as("s"))
    val loo = per.crossJoin(broadcast(tot))
      .select(expr("(CAST(s - si AS DECIMAL(38,0)) * 1000000)" +
        " div (n - ni)").as("m"), col("n"), col("s"))
    loo.groupBy("n", "s")
      .agg(count(lit(1)).as("nb"), sum(col("m").cast(dec)).as("sm"),
        sum(col("m").cast(dec) * col("m")).as("sm2"))
      .select(col("n").cast("long").as("n_rows"), col("nb").as("n_blocks"),
        expr("(CAST(s AS DECIMAL(38,0)) * 1000000) div n").as("mean_micro"),
        floor(sqrt((lit(b - 1).cast(dec)
            * (lit(b).cast(dec) * col("sm2") - col("sm") * col("sm")))
          .cast("double")) / b).cast("long").as("se_jk_micro"))
  }

  /** Kendall's τ-b between discount and tax — completes the correlation
    * trio (Pearson [[statsCorr]] / Spearman [[statsSpearman]] / Kendall):
    * the concordance statistic that is exactly computable from the JOINT
    * DISTRIBUTION when both columns have bounded distinct values.
    * Concordant/discordant pair counts come from one broadcast non-equi
    * self-join of the ~99-cell contingency relation (never the corpus);
    * tie corrections from the margins; everything exact in
    * DECIMAL(38,0) until ONE sqrt + division floored to 6 dp. */
  protected def statsKendall(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = t(spark, dir, "lineitem").select(
        floor(col("l_discount") * 100 + 0.5).cast("long").as("x"),
        floor(col("l_tax") * 100 + 0.5).cast("long").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // bounded cell relation, four consumers
    val cd = cells.as("a")
      .join(broadcast(cells.as("b")), col("a.x") < col("b.x"))
      .agg(
        sum(when(col("a.y") < col("b.y"),
          col("a.c").cast(dec) * col("b.c")).otherwise(lit(0).cast(dec)))
          .as("cc"),
        sum(when(col("a.y") > col("b.y"),
          col("a.c").cast(dec) * col("b.c")).otherwise(lit(0).cast(dec)))
          .as("dd"))
    val tx = cells.groupBy("x").agg(sum(col("c")).as("r"))
      .agg(sum(col("r").cast(dec) * (col("r") - 1)).as("tx2"))
    val ty = cells.groupBy("y").agg(sum(col("c")).as("r"))
      .agg(sum(col("r").cast(dec) * (col("r") - 1)).as("ty2"))
    val n = cells.agg(sum(col("c")).as("n"))
    cd.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(n))
      .select(col("n").cast("long").as("n"),
        col("cc").cast("double").as("concordant"),
        col("dd").cast("double").as("discordant"),
        (floor((col("cc") - col("dd")).cast("double")
          / sqrt((col("n").cast(dec) * (col("n") - 1) - col("tx2"))
              .cast("double")
            * (col("n").cast(dec) * (col("n") - 1) - col("ty2"))
              .cast("double"))
          * 2e6) / 1e6).as("tau6"))
  }

  /** Theil T inequality index of customer revenue — the ENTROPY-based
    * complement to [[statsGini]] (Theil is additively decomposable
    * across subgroups, which is why inequality audits carry both):
    * T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ). Exactness: with S = Σx the per-row
    * term is xᵢ·floor(ln(xᵢ·n / S)·10⁶) — ONE double ln per row floored
    * to micro-units BEFORE the weighted sum (the floor-then-sum
    * discipline; ln args are the same two exact-integer-cast doubles on
    * both engines), so the corpus sum is exact DECIMAL and T takes one
    * final integer division against n·S. One aggregate for (n, S), one
    * broadcast, one scan. */
  protected def statsTheil(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val rev = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("v"))
    val tot = rev.agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    rev.crossJoin(broadcast(tot))
      .select(col("n"), col("s"),
        (col("v").cast(dec) * floor(log(
          (col("v").cast(dec) * col("n")).cast("double")
            / col("s").cast("double")) * 1e6).cast(dec)).as("t"))
      .groupBy("n", "s").agg(sum(col("t")).as("st"))
      .select(col("n").cast("long").as("n_customers"),
        expr("st div (CAST(n AS DECIMAL(38,0)) * s)").as("theil_micro"))
  }

  /** Spearman rank correlation between discount and tax — the monotone-
    * association companion to Pearson [[statsCorr]] (what a drift audit
    * uses when the relationship is nonlinear but ordered). Exactness:
    * tie-averaged ranks double to integers (2r̄(v) = 2·cum_before + cnt
    * + 1, the rank-sum trick — the ½ clears, the 2 cancels in the
    * correlation), computed on the ≤ dozen-row DISTINCT-VALUE relations;
    * per-row rank pairs come from two broadcast value→rank joins; all
    * six moments accumulate in DECIMAL(38,0) with ONE double
    * division + sqrt floored to 6 dp. */
  protected def statsSpearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val base = t(spark, dir, "lineitem").select(
      floor(col("l_discount") * 100 + 0.5).cast("long").as("x"),
      floor(col("l_tax") * 100 + 0.5).cast("long").as("y"))
    def ranks(c: String): DataFrame = {
      val w = Window.orderBy(c).rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(c).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
        .select(col(c), (col("cum") * 2 + col("cnt") + 1).as(s"r$c"))
    }
    base.join(broadcast(ranks("x")), Seq("x"))
      .join(broadcast(ranks("y")), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("rx").cast(dec)).as("sx"), sum(col("ry").cast(dec)).as("sy"),
        sum(col("rx").cast(dec) * col("ry")).as("sxy"),
        sum(col("rx").cast(dec) * col("rx")).as("sxx"),
        sum(col("ry").cast(dec) * col("ry")).as("syy"))
      .select(col("n"),
        (floor((col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
            .cast("double")
          / sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
              .cast("double")
            * (col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
              .cast("double"))
          * 1e6) / 1e6).as("rho6"))
  }

  /** ANALYZE-style per-column statistics — the relation-level metadata a
    * cost-based optimizer feeds on (row count, NDV, null count, most-common
    * value with its frequency). One scan: the column set unpivots via
    * `stack` into (column, value) pairs, one shuffle builds per-value
    * counts (the sufficient statistic), and a second keys-sized aggregation
    * folds them into the report. The MCV tie-break is (count, value)-max —
    * total, so the report is byte-stable. A nullable derived column
    * exercises the null accounting. */
  protected def statsAnalyze(spark: SparkSession, dir: String): DataFrame = {
    val un = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .select(expr(
        """stack(4,
           'l_returnflag', l_returnflag,
           'l_linestatus', l_linestatus,
           'l_quantity', cast(cast(floor(l_quantity) as bigint) as string),
           'rf_nullable', nullif(l_returnflag, 'N')) as (col_name, v)"""))
    val vc = un.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
    vc.groupBy("col_name")
      .agg(sum("n").as("n_rows"),
        count(when(col("v").isNotNull, lit(1))).as("ndv"),
        coalesce(sum(when(col("v").isNull, col("n"))), lit(0L)).as("n_null"),
        max(when(col("v").isNotNull, struct(col("n"), col("v")))).as("_m"))
      .select(col("col_name"), col("n_rows"), col("ndv"), col("n_null"),
        col("_m.v").as("mcv"), col("_m.n").as("mcv_n"))
      .orderBy("col_name")
  }

  /** Equi-width 8-bin histogram of l_extendedprice — the other half of the
    * ANALYZE surface. Two aggregation passes: a 1-row (min, max) relation
    * broadcast back to the scan, then one shuffle by bin. No global sort,
    * no single-partition window — the shape equi-DEPTH ntile would not
    * give; bin edges derive from the broadcast extremes with the same IEEE
    * expression on both engines. */
  protected def statsHistogram(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem").select(col("l_extendedprice").as("v"))
    val mm = l.agg(min("v").as("lo"), max("v").as("hi"))
    l.crossJoin(broadcast(mm))
      .select(least(floor((col("v") - col("lo")) * 8.0 / (col("hi") - col("lo"))),
        lit(7L)).cast("long").as("bin"), col("v"), col("lo"), col("hi"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(22, 6))).cast("double").as("sum_price"),
        (floor((first(col("lo")) + col("bin") * (first(col("hi")) - first(col("lo"))) / 8.0)
          * 100 + 0.5) / 100).as("edge_lo"))
      .select(col("bin"), col("edge_lo"), col("n"), col("sum_price"))
      .orderBy("bin")
  }

  /** Pairwise Pearson correlations of the lineitem measures — the last
    * planner-stats primitive (ANALYZE → skew → cardinality → histograms →
    * correlation; a correlated-columns report is what justifies
    * multi-column statistics / z-order layouts). Exactness: measures
    * quantize to integer cents (⌊x·100+0.5⌋), every Σx/Σx²/Σxy
    * accumulates in DECIMAL(38,0) (Σx² reaches ~10²¹ at sf1 — Long
    * overflows), and each correlation forms driver-side from the exact
    * integers with the fixed op order num→double / sqrt(a→double ·
    * b→double), floored to 6 dp — the oracle replays the same HUGEINT
    * sums and double ops. ONE aggregate pass over the fact table (15
    * decimal sums + count); the 6-row report is driver-assembled like the
    * PCA/centroid tables. */
  protected def statsCorr(spark: SparkSession, dir: String): DataFrame = {
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val dec = DecimalType(38, 0)
    val q = t(spark, dir, "lineitem").select(cs.map(c =>
      floor(col(c) * 100 + 0.5).cast(dec).as(c)): _*)
    val pairs = for { i <- cs.indices; j <- cs.indices if i < j } yield (i, j)
    val aggCols =
      cs.map(c => sum(col(c)).as(s"s_$c")) ++
      cs.map(c => sum((col(c) * col(c)).cast(dec)).as(s"q_$c")) ++
      pairs.map { case (i, j) =>
        sum((col(cs(i)) * col(cs(j))).cast(dec)).as(s"p_${i}_$j") }
    val r = q.agg(count(lit(1)).as("n"), aggCols: _*).head()
    val n = BigInt(r.getLong(0))
    def big(name: String): BigInt =
      r.getDecimal(r.fieldIndex(name)).toBigInteger
    val rows = pairs.map { case (i, j) =>
      val (si, sj) = (big(s"s_${cs(i)}"), big(s"s_${cs(j)}"))
      val num = n * big(s"p_${i}_$j") - si * sj
      val di = n * big(s"q_${cs(i)}") - si * si
      val dj = n * big(s"q_${cs(j)}") - sj * sj
      val corr6 =
        if (di == 0 || dj == 0) 0.0
        else math.floor(num.doubleValue /
          math.sqrt(di.doubleValue * dj.doubleValue) * 1e6) / 1e6
      (cs(i), cs(j), corr6)
    }
    import spark.implicits._
    rows.toDF("col_a", "col_b", "corr6").orderBy("col_a", "col_b")
  }

  /** Benford first-digit audit of the money column — the fabricated-data /
    * corrupted-feed detector a data-quality pass runs over any monetary
    * field (Benford 1938; Nigrini's forensic-accounting practice).
    * Exactness: cents are exact integers, the leading digit is a STRING
    * head (no log applied to data), and the expected shares log10(1+1/d)
    * enter as 6 dp pre-floored INTEGER CONSTANTS identical on both
    * engines — the only double is one cast-and-divide per digit for the
    * chi² contribution (cleared-denominator integer numerator in
    * DECIMAL(38,0), single division, 6 dp floor). Scale shape: one scan +
    * one 9-group aggregate; the 9-row expected table broadcasts. */
  protected def statsBenford(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val digits = t(spark, dir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .filter(col("c") > 0)
      .select(substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    import spark.implicits._
    val exp = Seq(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
      .toDF("digit", "c6")
    val nDf = digits.agg(sum(col("n_obs")).as("n"))
    val num = col("n_obs").cast(dec) * 1000000 - col("n").cast(dec) * col("c6")
    digits.join(broadcast(exp), Seq("digit"))
      .crossJoin(broadcast(nDf))
      .select(col("digit"), col("n_obs"),
        (col("n").cast(dec) * col("c6")).cast("long").as("expected_micro"),
        (floor((num * num).cast("double")
          / (col("n").cast(dec) * col("c6") * 1000000).cast("double")
          * 1e6) / 1e6).as("contrib6"))
      .orderBy("digit")
  }

  /** Cramér's V association between order status and priority — the
    * categorical-dependence scan a feature-selection / leakage audit runs
    * over every column pair (Cramér 1946). Exactness: the contingency
    * table is exact integer counts; each cell's χ² contribution clears
    * denominators to the all-integer (n·o_ij − r_i·c_j)² over n·r_i·c_j in
    * DECIMAL(38,0) with ONE double division floored to 6 dp micro-units,
    * so the χ² sum is again exact-integer; V takes one IEEE sqrt (correctly
    * rounded everywhere) at the surface. Scale shape: one groupBy to the
    * |S|×|P| cell relation (15 rows here), margins/total are aggregates of
    * THAT, everything downstream is broadcast-sized. */
  protected def statsCramersV(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = t(spark, dir, "orders")
      .groupBy(col("o_orderstatus").as("s"), col("o_orderpriority").as("p"))
      .agg(count(lit(1)).as("o_ij"))
      .localCheckpoint(true) // |S|×|P| rows feeding four consumers
    val rm = cells.groupBy("s").agg(sum(col("o_ij")).as("r"))
    val cm = cells.groupBy("p").agg(sum(col("o_ij")).as("c"))
    val tot = cells.agg(sum(col("o_ij")).as("n"),
      countDistinct(col("s")).as("nr"), countDistinct(col("p")).as("nc"))
    val num = col("n").cast(dec) * col("o_ij") - col("r").cast(dec) * col("c")
    cells.join(rm, Seq("s")).join(cm, Seq("p"))
      .crossJoin(broadcast(tot))
      .select(floor((num * num).cast("double")
          / (col("n").cast(dec) * col("r") * col("c")).cast("double")
          * 1e6).cast("long").as("contrib6"),
        col("n"), col("nr"), col("nc"))
      .groupBy("n", "nr", "nc")
      .agg(sum(col("contrib6")).as("chi2_micro"), count(lit(1)).as("n_cells"))
      .select(col("n").cast("long").as("n_rows"), col("n_cells"),
        col("chi2_micro"),
        (floor(sqrt(col("chi2_micro").cast("double") / 1e6
          / (col("n").cast("double")
            * least(col("nr") - 1, col("nc") - 1).cast("double")))
          * 1e6) / 1e6).as("v6"))
  }

  /** Mann–Whitney rank-sum test: does l_quantity distribute identically
    * between returned (R) and accepted (A) lines? The nonparametric
    * two-sample location test (Mann & Whitney 1947) a drift monitor
    * prefers over the t-test on non-normal columns. Exactness: the
    * statistic works entirely on the DISTINCT-VALUE relation (≤ 50 rows
    * here — ties collapse) with integer group counts; doubling U clears
    * the ½-tie term (u2 = 2·U₁ = Σ 2·n1(v)·cum2(v) + n1(v)·n2(v), exact
    * in DECIMAL(38,0)), and the tie-corrected variance stays the exact
    * rational n1·n2·((n+1)·n·(n−1) − Σ(t³−t)) / (12·n·(n−1)) until ONE
    * sqrt + division floored to 6 dp. The running-count window runs over
    * the bounded distinct-value relation, never the corpus. */
  protected def statsRanksum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val vals = t(spark, dir, "lineitem")
      .filter(col("l_returnflag").isin("A", "R"))
      .select(floor(col("l_quantity") * 100 + 0.5).cast("long").as("v"),
        col("l_returnflag").as("g"))
      .groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("n1v"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("n2v"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val tc = (col("n1v") + col("n2v")).cast(dec)
    val agg = vals
      .withColumn("cum2", coalesce(sum(col("n2v")).over(w), lit(0L)))
      .agg(sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"),
        sum(col("n1v").cast(dec) * 2 * col("cum2")
          + col("n1v").cast(dec) * col("n2v")).as("u2"),
        sum(tc * tc * tc - tc).as("ties"))
    val n = col("n1").cast(dec) + col("n2")
    val a = (col("n1").cast(dec) * col("n2")
      * ((n + 1) * n * (n - 1) - col("ties"))).cast("double")
    val b = (lit(12).cast(dec) * n * (n - 1)).cast("double")
    agg.select(col("n1"), col("n2"), col("u2").cast("double").as("u2"),
      (floor((col("u2") - col("n1").cast(dec) * col("n2")).cast("double")
        / (lit(2.0) * sqrt(a / b)) * 1e6) / 1e6).as("z6"))
  }

  /** Shannon entropy profile of the categorical columns — the
    * information-content scan a planner (cardinality/skew modelling) and
    * a feature audit both want: near-zero entropy flags constant/leaky
    * columns, near-ln(k) flags uniform ones. Exactness: per distinct
    * value the term is floor(ln(c)·10⁶)·c — ONE double ln per distinct
    * value floored to integer micro-units BEFORE any cross-row sum (the
    * BM25 discipline: float sums are order-dependent, integer sums are
    * not), so H·n = L(n)·n − Σ L(c)·c is exact-integer in DECIMAL(38,0)
    * with one truncating division at the surface. Scale: one groupBy per
    * column, aggregates of the distinct-value relation. */
  protected def statsEntropy(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    def one(table: String, c: String): DataFrame =
      t(spark, dir, table).groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_distinct"),
          sum(floor(log(col("cnt").cast("double")) * 1e6).cast(dec)
            * col("cnt")).as("se"))
        .select(lit(table + "." + c).as("col_name"),
          col("n").cast("long").as("n"), col("n_distinct"),
          expr("(CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) AS DECIMAL(38,0))" +
            " * n - se) div n").as("h_micro"))
    one("orders", "o_orderstatus")
      .unionAll(one("orders", "o_orderpriority"))
      .unionAll(one("lineitem", "l_returnflag"))
      .orderBy("col_name")
  }

  /** Two-sample Kolmogorov–Smirnov distance between the quality-score
    * distributions of two sources — the drift/calibration test a curation
    * pipeline runs before mixing corpora ("is src1's quality distribution
    * the same as src0's?"). Exactness: quality floors to 4 dp integers,
    * both empirical CDFs accumulate as integer counts, and the statistic
    * keeps the cleared-denominator integer form max|c1·n2 − c2·n1| until
    * ONE final division floored to 6 dp. The running-count window runs
    * over the ≤ 10001-row distinct-quality relation (the skyline
    * precedent), never the corpus. */
  protected def statsKsQuality(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = t(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"),
        floor(TextAnalysis.qualityScore(col("text")) * 10000 + 0.5)
          .cast("long").as("q4"))
    val pts = m.groupBy("q4")
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("b"))
    val w = Window.orderBy("q4")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = pts
      .withColumn("ca", sum(col("a")).over(w))
      .withColumn("cb", sum(col("b")).over(w))
    cum.crossJoin(broadcast(
        m.groupBy().agg(
          sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n1"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n2"))))
      .select(col("q4"), col("n1"), col("n2"),
        abs(col("ca") * col("n2") - col("cb") * col("n1")).as("dnum"))
      .orderBy(col("dnum").desc, col("q4"))
      .limit(1)
      .select(col("n1"), col("n2"), col("q4").as("ks_at_q4"),
        (floor(col("dnum") * 1e6 / (col("n1") * col("n2"))) / 1e6).as("ks6"))
  }

  /** Wald–Wolfowitz runs test on daily volume — "is traffic randomly
    * scattered around its median, or does it trend/cluster?" (the
    * randomness check an anomaly baseline assumes; a trending series
    * has FEW long runs, an oscillating one too many). Exactness: the
    * lower median picks by integer rank over the bounded day relation,
    * ties to the median drop (the standard rule), runs count via one
    * lag edge-detect, and z clears to (n·(R−1) − 2n₁n₂) over
    * √(2n₁n₂(2n₁n₂−n)/(n−1)) — exact integers under ONE sqrt, 4 dp
    * floor. All windows run over the bounded daily series. */
  protected def statsRunsTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val med = days
      .withColumn("rk", row_number().over(Window.orderBy(col("x"), col("day"))))
      .crossJoin(broadcast(days.agg(count(lit(1)).as("nd"))))
      .filter(col("rk") === expr("(nd + 1) div 2"))
      .select(col("x").as("med"))
    val signed = days.crossJoin(broadcast(med))
      .filter(col("x") =!= col("med"))
      .withColumn("above", when(col("x") > col("med"), 1L).otherwise(0L))
      .withColumn("chg", when(coalesce(lag(col("above"), 1)
        .over(Window.orderBy("day")), col("above")) =!= col("above"), 1L)
        .otherwise(0L))
    val agg = signed.agg(count(lit(1)).as("n"),
      sum(col("above")).as("n1"), sum(lit(1L) - col("above")).as("n2"),
      (sum(col("chg")) + 1).as("runs"), first(col("med")).as("med"))
    // Parenthesized across lines: a leading `-` on a continuation line
    // would otherwise parse as a discarded unary statement.
    val a = (col("n").cast(dec) * (col("runs") - 1)
      - lit(2).cast(dec) * col("n1") * col("n2"))
    val bb = (lit(2).cast(dec) * col("n1") * col("n2")
      * (lit(2).cast(dec) * col("n1") * col("n2") - col("n")))
    agg.select(col("n").cast("long").as("n_days"),
        col("med").as("median_volume"),
        col("n1").as("n_above"), col("n2").as("n_below"),
        col("runs").as("n_runs"),
        (floor(a.cast("double")
          / sqrt(bb.cast("double") / (col("n").cast("double") - 1))
          * 1e4) / 1e4).as("z4"))
  }

  /** Mann–Kendall trend test on daily volume (Mann 1945; Kendall 1975)
    * with Sen's slope (Sen 1968) — the monotone-trend sibling of
    * [[statsRunsTest]]'s randomness check plus the magnitude estimator
    * that makes it actionable: S = Σ_{i<j} sgn(x_j − x_i) over the
    * bounded daily series, variance with the tie-group correction
    * (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18, the ±1-continuity-corrected z,
    * and the lower-median of the pairwise slopes. Exactness: S and both
    * variance terms are exact integers (the pair sweep is a broadcast
    * self-join over ~30 daily rows — never a corpus join); each slope is
    * floor((x_j−x_i)·10⁶ / (day_j−day_i)) — the double division is exact
    * below 2⁵³ and EXPLICIT floor sidesteps the Spark-div-truncates vs
    * DuckDB-//-floors mismatch on negative slopes; the median picks the
    * k-th smallest VALUE, which tie order cannot move. One division and
    * one sqrt in double at the surface, 4 dp floor. */
  protected def statsMannKendall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val pairs = days.as("a").join(broadcast(days.as("b")),
        col("a.day") < col("b.day"))
      .select(signum(col("b.x") - col("a.x")).cast("long").as("sgn"),
        floor((col("b.x") - col("a.x")).cast("double") * 1e6
          / (col("b.day") - col("a.day"))).cast("long").as("slope6"))
    val s = pairs.agg(coalesce(sum(col("sgn")), lit(0L)).as("s"),
      count(lit(1)).as("p"))
    val sen = pairs
      .withColumn("rk", row_number().over(Window.orderBy("slope6")))
      .crossJoin(broadcast(s.select(col("p"))))
      .filter(col("rk") === expr("(p + 1) div 2"))
      .select(col("slope6").as("sen_slope_micro"))
    val ties = days.groupBy("x").agg(count(lit(1)).as("tcount"))
      .agg(coalesce(sum(col("tcount").cast(dec) * (col("tcount") - 1)
        * (lit(2).cast(dec) * col("tcount") + 5)), lit(0).cast(dec))
        .as("tie_term"),
        sum(col("tcount")).as("n"))
    s.crossJoin(broadcast(ties)).crossJoin(broadcast(sen))
      .select(col("n").cast("long").as("n_days"), col("s"),
        (floor((when(col("s") > 0, col("s") - 1)
            .when(col("s") < 0, col("s") + 1).otherwise(lit(0L)))
            .cast("double")
          / sqrt((col("n").cast(dec) * (col("n") - 1)
              * (lit(2).cast(dec) * col("n") + 5) - col("tie_term"))
            .cast("double") / 18.0)
          * 1e4) / 1e4).as("z4"),
        col("sen_slope_micro"))
  }

  /** Per-return-flag ordinary least squares of extended price on
    * quantity (Legendre 1805 / Gauss — the oldest drift detector there
    * is: "does the unit-price relationship hold per cohort, and how
    * much variance does the line explain"). Exactness: x is centi-
    * quantity, y is cents; the five moments are exact DECIMAL(38,0);
    * the centered pieces Sxx = n·Σx²−(Σx)², Sxy, Syy stay exact; the
    * slope is the exact truncating division Sxy·10⁶ div Sxx (Spark div
    * and DuckDB // BOTH truncate toward zero — verified, not assumed —
    * so a negative numerator quantizes identically), the intercept
    * replays from the TRUNCATED slope, and r² is one
    * fixed-order double expression over the exact decimals, 4 dp floor.
    * Scale: one groupBy over the corpus; everything after is 3 rows. */
  protected def statsOls(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val li = t(spark, dir, "lineitem").select(
      col("l_returnflag").as("flag"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    li.groupBy("flag").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      .withColumn("dxx", col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
      .withColumn("dxy", col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
      .withColumn("dyy", col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
      .withColumn("num", col("dxy") * lit(1000000L).cast(dec))
      .withColumn("slope6", expr("num div dxx"))
      .withColumn("inum", col("sy") * lit(1000000L).cast(dec)
        - col("slope6").cast(dec) * col("sx"))
      .select(col("flag"), col("n"), col("slope6"),
        expr("inum div CAST(n AS DECIMAL(38,0))").as("intercept6"),
        (floor(col("dxy").cast("double") * col("dxy").cast("double")
          / (col("dxx").cast("double") * col("dyy").cast("double"))
          * 1e4) / 1e4).as("r2_4"))
      .orderBy("flag")
  }

  /** Kruskal–Wallis H across the three return-flag cohorts on quantity
    * (Kruskal & Wallis 1952) — the k-group generalization of
    * [[statsRanksum]]'s two-sample location test. Exactness: the same
    * DISTINCT-VALUE relation trick (≤ 50 quantity slots; the running-
    * count window never touches the corpus); 2-scaled midranks
    * r2(v) = 2·cum(v) + t(v) + 1 clear the ½-tie term so the per-group
    * rank sums R2_g are exact integers; H and the tie-corrected H_c are
    * each ONE fixed-order double expression over the exact pieces
    * (three explicit per-group terms — no cross-row double sum), 4 dp
    * floor. */
  protected def statsKruskal(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val vals = t(spark, dir, "lineitem")
      .select(floor(col("l_quantity") * 100 + 0.5).cast("long").as("v"),
        col("l_returnflag").as("g"))
      .groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "N", 1L).otherwise(0L)).as("cn"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("cr"))
      .withColumn("t", col("ca") + col("cn") + col("cr"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    val agg = vals
      .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum") + col("t") + lit(1L))
      .agg(sum(col("ca")).as("n1"), sum(col("cn")).as("n2"),
        sum(col("cr")).as("n3"),
        sum(col("ca").cast(dec) * col("r2")).cast("long").as("r2a"),
        sum(col("cn").cast(dec) * col("r2")).cast("long").as("r2b"),
        sum(col("cr").cast(dec) * col("r2")).cast("long").as("r2c"),
        sum(col("t").cast(dec) * col("t") * col("t")
          - col("t").cast(dec)).as("ties"))
    // H = 3·Σ_g R2_g²/n_g / (N(N+1)) − 3(N+1)   (R_g = R2_g/2, 12/4 = 3)
    val st = (col("r2a").cast("double") * col("r2a").cast("double") /
      col("n1").cast("double")) +
      (col("r2b").cast("double") * col("r2b").cast("double") /
        col("n2").cast("double")) +
      (col("r2c").cast("double") * col("r2c").cast("double") /
        col("n3").cast("double"))
    val nTot = col("n1") + col("n2") + col("n3")
    val nD = nTot.cast("double")
    val h = lit(3.0) * st / (nD * (nD + 1.0)) - lit(3.0) * (nD + 1.0)
    val dBig = nTot.cast(dec) * nTot * nTot - nTot.cast(dec)
    val hc = h * dBig.cast("double") / (dBig - col("ties")).cast("double")
    agg.select(nTot.as("n"), col("n1"), col("n2"), col("n3"),
      col("r2a"), col("r2b"), col("r2c"),
      (floor(h * 1e4) / 1e4).as("h4"),
      (floor(hc * 1e4) / 1e4).as("hc4"))
  }

  /** One-way ANOVA F across the three return-flag cohorts on quantity
    * (Fisher 1925) — the parametric sibling of [[statsKruskal]]: same
    * question, mean-based instead of rank-based, so the pair documents
    * how much the rank transform costs/buys on this data. Exactness:
    * per-group n/Σv/Σv² from ONE conditional aggregate pass are exact
    * DECIMAL(38,0); SSB = Σ s_g²/n_g − S²/N and SSW = Σq − Σ s_g²/n_g
    * assemble in ONE fixed-order double expression (three explicit
    * per-group terms, no cross-row double sum) and
    * F = (SSB/(k−1))/(SSW/(N−k)) floors at 4 dp. */
  protected def statsAnova(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val agg = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("v"))
      .agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "A", col("v")).otherwise(0L).cast(dec)).as("s1"),
        sum(when(col("g") === "A", col("v").cast(dec) * col("v"))
          .otherwise(lit(0).cast(dec))).as("q1"),
        sum(when(col("g") === "N", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "N", col("v")).otherwise(0L).cast(dec)).as("s2"),
        sum(when(col("g") === "N", col("v").cast(dec) * col("v"))
          .otherwise(lit(0).cast(dec))).as("q2"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("n3"),
        sum(when(col("g") === "R", col("v")).otherwise(0L).cast(dec)).as("s3"),
        sum(when(col("g") === "R", col("v").cast(dec) * col("v"))
          .otherwise(lit(0).cast(dec))).as("q3"))
    def d(c: Column): Column = c.cast("double")
    val bet = d(col("s1")) * d(col("s1")) / d(col("n1")) +
      d(col("s2")) * d(col("s2")) / d(col("n2")) +
      d(col("s3")) * d(col("s3")) / d(col("n3"))
    val nTot = col("n1") + col("n2") + col("n3")
    val sTot = d(col("s1")) + d(col("s2")) + d(col("s3"))
    val qTot = d(col("q1")) + d(col("q2")) + d(col("q3"))
    val ssb = bet - sTot * sTot / d(nTot)
    val ssw = qTot - bet
    val f = (ssb / 2.0) / (ssw / (d(nTot) - 3.0))
    agg.select(nTot.as("n"), col("n1"), col("n2"), col("n3"),
      (floor(ssb * 1e2) / 1e2).as("ssb2"),
      (floor(ssw * 1e2) / 1e2).as("ssw2"),
      (floor(f * 1e4) / 1e4).as("f4"))
  }

  /** Brown–Forsythe variance-equality test (Levene 1960 test with the
    * Brown & Forsythe 1974 median centering) across the return-flag
    * cohorts on quantity — the guard one runs BEFORE trusting a pooled
    * test: are the spreads even comparable? FULLY exact pieces: group
    * medians come from the distinct-value relation as 2-SCALED sums of
    * the lower+upper middle order statistics (so even-count medians
    * stay integer), per-row deviations |2v − med2| are exact integers,
    * and the one-way F on the deviations assembles from exact
    * DECIMAL(38,0) moments through the same fixed-order
    * three-explicit-terms surface as [[statsAnova]], 4 dp floor. */
  protected def statsLevene(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val vals = t(spark, dir, "lineitem")
      .select(floor(col("l_quantity") * 100 + 0.5).cast("long").as("v"),
        col("l_returnflag").as("g"))
      .groupBy("v").agg(
        sum(when(col("g") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("g") === "N", 1L).otherwise(0L)).as("cn"),
        sum(when(col("g") === "R", 1L).otherwise(0L)).as("cr"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val cum = vals
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumn", sum(col("cn")).over(w))
      .withColumn("cumr", sum(col("cr")).over(w))
    val tot = vals.agg(sum(col("ca")).as("na"), sum(col("cn")).as("nb"),
      sum(col("cr")).as("nc"))
    // med2_g = v[(n+1) div 2] + v[(n+2) div 2] (1-based kth smallest
    // via the cumulative counts on the bounded distinct-value relation).
    val med = cum.crossJoin(broadcast(tot)).agg(
      (min(when(col("cuma") >= expr("(na + 1) div 2"), col("v"))) +
        min(when(col("cuma") >= expr("(na + 2) div 2"), col("v"))))
        .as("medA2"),
      (min(when(col("cumn") >= expr("(nb + 1) div 2"), col("v"))) +
        min(when(col("cumn") >= expr("(nb + 2) div 2"), col("v"))))
        .as("medN2"),
      (min(when(col("cumr") >= expr("(nc + 1) div 2"), col("v"))) +
        min(when(col("cumr") >= expr("(nc + 2) div 2"), col("v"))))
        .as("medR2"))
    val agg = vals.crossJoin(broadcast(med)).agg(
      sum(col("ca")).as("n1"),
      sum(col("ca").cast(dec) * abs(lit(2L) * col("v") - col("medA2")))
        .as("s1"),
      sum(col("ca").cast(dec) * abs(lit(2L) * col("v") - col("medA2"))
        * abs(lit(2L) * col("v") - col("medA2"))).as("q1"),
      sum(col("cn")).as("n2"),
      sum(col("cn").cast(dec) * abs(lit(2L) * col("v") - col("medN2")))
        .as("s2"),
      sum(col("cn").cast(dec) * abs(lit(2L) * col("v") - col("medN2"))
        * abs(lit(2L) * col("v") - col("medN2"))).as("q2"),
      sum(col("cr")).as("n3"),
      sum(col("cr").cast(dec) * abs(lit(2L) * col("v") - col("medR2")))
        .as("s3"),
      sum(col("cr").cast(dec) * abs(lit(2L) * col("v") - col("medR2"))
        * abs(lit(2L) * col("v") - col("medR2"))).as("q3"))
    def d(c: Column): Column = c.cast("double")
    val bet = d(col("s1")) * d(col("s1")) / d(col("n1")) +
      d(col("s2")) * d(col("s2")) / d(col("n2")) +
      d(col("s3")) * d(col("s3")) / d(col("n3"))
    val nTot = col("n1") + col("n2") + col("n3")
    val sTot = d(col("s1")) + d(col("s2")) + d(col("s3"))
    val qTot = d(col("q1")) + d(col("q2")) + d(col("q3"))
    val ssb = bet - sTot * sTot / d(nTot)
    val ssw = qTot - bet
    val f = (ssb / 2.0) / (ssw / (d(nTot) - 3.0))
    agg.select(nTot.as("n"), col("n1"), col("n2"), col("n3"),
      col("s1").cast("long").as("dev2_sum_a"),
      col("s2").cast("long").as("dev2_sum_n"),
      col("s3").cast("long").as("dev2_sum_r"),
      (floor(f * 1e4) / 1e4).as("f4"))
  }

  /** Welch's unequal-variance t-test (Welch 1947) between the BUILDING
    * and AUTOMOBILE segments on account balance, with the Welch–
    * Satterthwaite df — the two-cohort mean comparison that does not
    * assume pooled variance (the A/B-test workhorse). Exactness:
    * balances are exact integer cents (can be negative); per-group
    * n/Σv/Σv² are exact DECIMAL(38,0) from ONE conditional aggregate
    * (one corpus pass, single-row result); group means are exact
    * truncating divisions (Spark div ≡ DuckDB //, both toward zero, so
    * negative balances quantize identically); t and df are each one fixed-order
    * double expression over the exact moments, 4 dp / 2 dp floor. */
  protected def statsWelch(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val v = floor(col("c_acctbal") * 100 + 0.5).cast("long")
    val agg = t(spark, dir, "customer")
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_mktsegment").as("g"), v.as("v"))
      .agg(
        sum(when(col("g") === "BUILDING", 1L).otherwise(0L)).as("n1"),
        sum(when(col("g") === "BUILDING", col("v")).otherwise(0L)
          .cast(dec)).as("s1"),
        sum(when(col("g") === "BUILDING", col("v").cast(dec) * col("v"))
          .otherwise(lit(0).cast(dec))).as("q1"),
        sum(when(col("g") === "AUTOMOBILE", 1L).otherwise(0L)).as("n2"),
        sum(when(col("g") === "AUTOMOBILE", col("v")).otherwise(0L)
          .cast(dec)).as("s2"),
        sum(when(col("g") === "AUTOMOBILE", col("v").cast(dec) * col("v"))
          .otherwise(lit(0).cast(dec))).as("q2"))
    // sample variance over n: (n·Σv² − (Σv)²) / (n(n−1)); vn_g = var/n
    val vn1 = (col("n1").cast(dec) * col("q1") - col("s1") * col("s1"))
      .cast("double") / (col("n1").cast("double") * col("n1").cast("double")
        * (col("n1").cast("double") - 1.0))
    val vn2 = (col("n2").cast(dec) * col("q2") - col("s2") * col("s2"))
      .cast("double") / (col("n2").cast("double") * col("n2").cast("double")
        * (col("n2").cast("double") - 1.0))
    val tStat = (col("s1").cast("double") / col("n1").cast("double")
      - col("s2").cast("double") / col("n2").cast("double")) / sqrt(vn1 + vn2)
    val df = (vn1 + vn2) * (vn1 + vn2) /
      (vn1 * vn1 / (col("n1").cast("double") - 1.0)
        + vn2 * vn2 / (col("n2").cast("double") - 1.0))
    agg
      .withColumn("m1num", col("s1") * lit(1000000L).cast(dec))
      .withColumn("m2num", col("s2") * lit(1000000L).cast(dec))
      .select(col("n1"), col("n2"),
        expr("m1num div CAST(n1 AS DECIMAL(38,0))").as("mean1_micro"),
        expr("m2num div CAST(n2 AS DECIMAL(38,0))").as("mean2_micro"),
        (floor(tStat * 1e4) / 1e4).as("t4"),
        (floor(df * 1e2) / 1e2).as("df2"))
  }

  /** Wilcoxon signed-rank test between the paired daily view and
    * purchase counts (Wilcoxon 1945) — the PAIRED-location member of
    * the nonparametric family: ranksum compares two independent
    * groups, this asks whether the per-day (view − purchase)
    * differences are symmetric around zero, respecting the pairing.
    * FULLY integer until one mirrored sqrt surface: zero differences
    * drop (the classic convention), |d| gets 2-scaled mid-ranks over
    * the bounded distinct-|d| relation (the [[statsKruskal]]/[[llmAuc]]
    * tie discipline — group, cumulate, rank2 = 2·cum + t + 1), W₂⁺
    * sums positive-d ranks exactly, and z₄ = floor((2W₂⁺ − n(n+1))·10⁴
    * / √(2n(n+1)(2n+1)/3)) — the ×4-cleared normal approximation
    * (no tie-correction term, documented classic form). */
  protected def statsSignedRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .as("v"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("p"))
    val dd = days.select((col("v") - col("p")).as("d"))
      .filter(col("d") =!= 0)
      .select(abs(col("d")).as("ad"), (col("d") > 0).as("pos"))
    val grp = dd.groupBy("ad")
      .agg(count(lit(1)).as("t"),
        sum(when(col("pos"), 1L).otherwise(0L)).as("tp"))
    val w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    grp.withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum") + col("t") + lit(1L))
      .agg(sum(col("t")).as("n"),
        sum(col("tp") * col("r2")).as("w2"))
      .filter(col("n") >= 1)
      .select(col("n"), col("w2").as("w2_plus"),
        expr("CAST(floor((2 * w2 - n * (n + 1)) * 10000 / " +
          "sqrt(CAST(2 * n AS DOUBLE) * (n + 1) * (2 * n + 1) / " +
          "CAST(3 AS DOUBLE))) AS BIGINT)").as("z4"))
  }

  /** Population stability index between the even- and odd-user cohorts
    * over (event_type × day-of-week) cells — the scorecard-monitoring
    * drift metric (Siddiqi 2006) a feature pipeline tracks release over
    * release; companion to [[llmJsd]]'s corpus-mix divergence.
    * Exactness: cell counts get Laplace +1 smoothing (PSI is undefined
    * on empty cells; both engines smooth identically), the per-cell
    * term is the exact integer (a·tb − b·ta) · floor(ln(a·tb/(b·ta))·10⁸)
    * — same-sign factors, so every term is ≥ 0 and the one truncating
    * division at the surface is a floor. One groupBy over the corpus;
    * the term sum runs over the bounded cell relation. */
  protected def statsPsi(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = t(spark, dir, "events")
      .select(concat(col("event_type"), lit(":"),
          pmod(expr("ts div 86400000000000"), lit(7L))).as("cat"),
        pmod(col("user_id"), lit(2L)).as("par"))
      .groupBy("cat").agg(
        (sum(when(col("par") === 0L, 1L).otherwise(0L)) + 1L).as("a"),
        (sum(when(col("par") === 1L, 1L).otherwise(0L)) + 1L).as("b"))
    val tot = cells.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"),
      count(lit(1)).as("n_cells"))
    cells.crossJoin(broadcast(tot))
      .select(col("n_cells"), col("ta"), col("tb"),
        ((col("a").cast(dec) * col("tb") - col("b").cast(dec) * col("ta"))
          * floor(log(col("a").cast("double") * col("tb").cast("double")
              / (col("b").cast("double") * col("ta").cast("double")))
            * 1e8).cast(dec)).as("term"))
      .groupBy("n_cells", "ta", "tb")
      .agg(sum(col("term")).as("numer"))
      .withColumn("den", col("ta").cast(dec) * col("tb"))
      .select(col("n_cells"), col("ta").cast("long").as("ta"),
        col("tb").cast("long").as("tb"),
        expr("CAST(numer div den AS BIGINT)").as("psi8"))
  }

  /** Lag-1 autocorrelation of the per-minute event-volume series — the
    * "is traffic self-similar minute to minute" diagnostic that
    * calibrates anomaly thresholds (a high r₁ means volume alarms need
    * trend-aware baselines like [[tsEwma]], not static bands).
    * Exactness: the series is integer COUNTS, adjacent-minute pairs come
    * from a distributed self-equi-join of the bin relation on bin+1, all
    * six moments accumulate in DECIMAL(38,0), and Pearson takes one
    * double division + sqrt floored to 6 dp (the statsCorr discipline). */
  protected def statsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val bins = t(spark, dir, "events")
      .groupBy(expr("ts div 60000000000").as("bin"))
      .agg(count(lit(1)).as("x"))
    // Lag-1 pairs via a self-equi-join on bin+1 — NOT a global lead()
    // window (WindowSweep's one catch): the minute-bin relation is
    // span-bounded, but a years-long corpus still has millions of minutes
    // and a global window funnels them through ONE task; the join
    // shuffles on bin and scales with the span. Same pair set: lead(bin)
    // filtered to nb == bin+1 ≡ join where bin+1 is occupied.
    val pairs = bins.join(
      bins.select((col("bin") - 1).as("pbin"), col("x").as("y")),
      col("bin") === col("pbin"))
    pairs.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y")).as("sxy"),
        sum(col("x").cast(dec) * col("x")).as("sxx"),
        sum(col("y").cast(dec) * col("y")).as("syy"))
      .select(col("n"),
        (floor((col("n").cast(dec) * col("sxy") - col("sx") * col("sy"))
            .cast("double")
          / sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
              .cast("double")
            * (col("n").cast(dec) * col("syy") - col("sy") * col("sy"))
              .cast("double"))
          * 1e6) / 1e6).as("r1_6"))
  }

  /** Effect sizes per event type — the magnitude layer the p-value
    * family ([[statsWelch]], [[statsRanksum]]) deliberately omits:
    * Cohen's d (pooled-SD standardized mean difference, Cohen 1988)
    * and Cliff's delta (the rank-robust dominance probability,
    * Cliff 1993) between the am and pm daily revenue samples. The
    * samples are day-grain totals (≤ 31 per side per type), so
    * Cliff's Σ sgn pair sweep is a broadcast self-join over bounded
    * relations — the [[statsMannKendall]] shape, never a corpus
    * pair. Exactness: moments are exact integer cents; delta₄ uses
    * the explicit-floor double division (exact below 2⁵³, and floor
    * sidesteps Spark-div-truncates vs DuckDB-//-floors on negative
    * dominance); d₄ is ONE textually-identical double expression
    * floored to 4 dp on both engines. */
  protected def statsEffectSize(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        (expr(s"(ts div $hourNs) % 24") < 12).as("am"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day", "am")
      .agg(sum(col("cents")).as("v"))
    val x = daily.filter(col("am")).select(col("event_type"), col("v"))
    val y = daily.filter(!col("am")).select(col("event_type"), col("v"))
    // Squared daily cents totals route through DECIMAL(38,0) (the
    // aggHhi / eExpPowerMeans convention): a Long v*v overflows silently
    // past ~$30M per type/half-day under non-ANSI mode.
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val mx = x.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("v")).as("sx"),
      sum(col("v").cast(dec38) * col("v").cast(dec38)).as("sxx"))
    val my = y.groupBy("event_type").agg(count(lit(1)).as("m"),
      sum(col("v")).as("sy"),
      sum(col("v").cast(dec38) * col("v").cast(dec38)).as("syy"))
    val pairs = x.as("a")
      .join(broadcast(y.as("b")), "event_type")
      .groupBy("event_type")
      .agg(sum(when(col("a.v") > col("b.v"), 1L).otherwise(0L)).as("gt"),
        sum(when(col("a.v") < col("b.v"), 1L).otherwise(0L)).as("lt"),
        count(lit(1)).as("nm"))
    mx.join(my, "event_type").join(pairs, "event_type")
      .select(col("event_type"), col("n").as("n_am"), col("m").as("n_pm"),
        expr("sx div n").as("mean_am_cents"),
        expr("sy div m").as("mean_pm_cents"),
        expr("""CASE WHEN n + m - 2 <= 0
                  OR (sxx - CAST(sx AS DOUBLE) * sx / n)
                   + (syy - CAST(sy AS DOUBLE) * sy / m) <= 0 THEN 0
                ELSE CAST(floor(
                  (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / m)
                  / sqrt(((sxx - CAST(sx AS DOUBLE) * sx / n)
                        + (syy - CAST(sy AS DOUBLE) * sy / m))
                        / (n + m - 2)) * 10000) AS BIGINT) END""")
          .as("cohen_d4"),
        expr("CAST(floor(CAST(gt - lt AS DOUBLE) * 10000 / nm) AS BIGINT)")
          .as("cliff_delta4"))
      .orderBy("event_type")
  }

  /** CUSUM drift monitor over daily revenue per event type (Page 1954) —
    * the sequential complement to `q_ts_changepoint`'s retrospective
    * split: S_t = max(0, S_{t−1} + x_t − μ), computed WITHOUT the
    * textbook recursion via its closed form
    * S_t = C_t − min(0, min_{j≤t} C_j) with C the prefix sum of (x − μ)
    * — two ordered windows over the bounded day-grain relation instead
    * of iterative state, so the operator is one pass however long the
    * series. All integer cents (μ = sum div n); alarm threshold h = μ
    * (one mean day's excess mass). Reports per type the peak CUSUM, the
    * EARLIEST peak day (struct-max argmax, deterministic), and the alarm
    * count. Scale shape: corpus → day bins once; windows run per type
    * over ≤366 rows each. */
  protected def statsCusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day")
      .agg(sum(col("cents")).as("x"))
      .localCheckpoint(true) // mean + windowed scan
    val mu = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), expr("sum(x) div count(1)").as("mu"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(mu), "event_type")
      .withColumn("c", sum(col("x") - col("mu")).over(w))
      .withColumn("s", col("c") - least(lit(0L), min(col("c")).over(w)))
      .groupBy("event_type")
      .agg(first(col("n_days")).as("n_days"), first(col("mu")).as("mu_cents"),
        max(struct(col("s"), (-col("day")).as("negday"))).as("pk"),
        sum(when(col("s") > col("mu"), 1L).otherwise(0L)).as("n_alarm_days"))
      .select(col("event_type"), col("n_days"), col("mu_cents"),
        col("pk").getField("s").as("max_cusum"),
        (-col("pk").getField("negday")).as("peak_day"),
        col("n_alarm_days"))
      .orderBy("event_type")
  }

  /** Randomization (permutation) test for the am-vs-pm daily-revenue mean
    * difference per event type (Fisher 1935's exact-under-exchangeability
    * complement to [[statsWelch]]'s asymptotics — the test that stays
    * honest when n is small or the distribution is ugly): 200 md5-derived
    * relabelings of the day-grain bins, two-sided
    * p = (1 + #extreme) · 10⁶ div 201. EVERYTHING integer: group sums stay
    * exact cents, and mean comparisons CROSS-MULTIPLY —
    * |sa·nb − sb·na| · (na·nb)_obs ≥ |obs cross| · (na·nb)_perm — so no
    * division ever happens (DECIMAL(38,0) products, the effect-size
    * convention); a degenerate relabeling (one side empty) makes both
    * sides' permuted cross-product zero and counts extreme, identically
    * on both engines. Scale shape: the corpus reduces ONCE to
    * ≤ |types|·|days|·2 bins; the 200-way fanout and every comparison run
    * over that bounded relation, never the corpus. */
  protected def statsPermTest(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val nPerms = 200
    val dec = DecimalType(38, 0)
    val bins = t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        (expr(s"(ts div $hourNs) % 24") < 12).as("am"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type", "day", "am")
      .agg(sum(col("cents")).as("v"))
      .localCheckpoint(true) // observed stat + the 200-way fanout
    val obs = bins.groupBy("event_type").agg(
      sum(when(col("am"), 1L).otherwise(0L)).as("n_am"),
      sum(when(col("am"), col("v")).otherwise(0L)).as("s_am"),
      sum(when(!col("am"), 1L).otherwise(0L)).as("n_pm"),
      sum(when(!col("am"), col("v")).otherwise(0L)).as("s_pm"))
    val perms = bins
      .select(col("event_type"), col("day"), col("am"), col("v"),
        explode(expr(s"sequence(0L, ${nPerms - 1}L)")).as("p"))
      .withColumn("grp", pmod(
        conv(substring(md5(concat_ws("|", col("p"), col("event_type"),
          col("day"), when(col("am"), lit(1)).otherwise(lit(0)))), 1, 8),
          16, 10).cast("long"), lit(2)))
      .groupBy("event_type", "p")
      .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("grp") === 0, col("v")).otherwise(0L)).as("sa"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("nb"),
        sum(when(col("grp") === 1, col("v")).otherwise(0L)).as("sb"))
    val ext = perms.join(obs, "event_type")
      .select(col("event_type"),
        when(abs(col("sa").cast(dec) * col("nb")
              - col("sb").cast(dec) * col("na"))
            * (col("n_am").cast(dec) * col("n_pm"))
          >= abs(col("s_am").cast(dec) * col("n_pm")
              - col("s_pm").cast(dec) * col("n_am"))
            * (col("na").cast(dec) * col("nb")), 1L).otherwise(0L).as("x"))
      .groupBy("event_type").agg(sum(col("x")).as("n_extreme"))
    obs.join(ext, "event_type")
      .select(col("event_type"), col("n_am"), col("n_pm"),
        abs(col("s_am").cast(dec) * col("n_pm")
          - col("s_pm").cast(dec) * col("n_am")).cast("long")
          .as("obs_cross"),
        col("n_extreme"),
        expr(s"(1 + n_extreme) * 1000000 div ${nPerms + 1}").as("p_micro"))
      .orderBy("event_type")
  }

  /** Exact two-sided Fisher test per event type (Fisher 1935) — the
    * small-table independence test the χ² family cannot honestly run
    * when cells are sparse: is a phase's am-majority independent of the
    * early/late fold? The 2×2 is built from the 31-phase day fold (the
    * [[statsSignBh]] bounding trick — n ≤ 31 data-INDEPENDENTLY), so
    * the hypergeometric weights w(x) = C(r₁,x)·C(n−r₁,c₁−x) stay below
    * C(31,15)² ≈ 9·10¹⁶ in plain BIGINT. EVERYTHING is exact integers:
    * binomials fold by the in-order recurrence C(m,j) =
    * C(m,j−1)(m−j+1)/j (each prefix product IS a binomial, so `div`
    * never truncates), the two-sided p sums every support point with
    * w(x) ≤ w(a) against the Vandermonde total Σw(x) = C(n,c₁) — the
    * denominator is SUMMED, not re-derived, so a wrong weight breaks
    * the identity and the oracle hash. One division at 10⁻⁶ scale,
    * both operands non-negative (truncate == floor in both engines).
    * Scale shape: one phase-keyed aggregate (bounded 31·|types|), a
    * broadcast ≤32-row support explode — no corpus-sized anything
    * past the first groupBy. */
  protected def statsFisherExact(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val ph = t(spark, dir, "events")
      .select(col("event_type"),
        expr(s"(ts div $dayNs) % 31").as("ph"),
        (expr(s"(ts div $hourNs) % 24") < 12).as("am"))
      .groupBy("event_type", "ph")
      .agg(sum(when(col("am"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("am"), 1L).otherwise(0L)).as("np"))
      .select(col("event_type"), (col("ph") < 16).as("early"),
        (col("na") > col("np")).as("ammaj"))
    val cells = ph.groupBy("event_type")
      .agg(sum(when(col("early") && col("ammaj"), 1L).otherwise(0L)).as("a"),
        sum(when(col("early") && !col("ammaj"), 1L).otherwise(0L)).as("b"),
        sum(when(!col("early") && col("ammaj"), 1L).otherwise(0L)).as("c"),
        sum(when(!col("early") && !col("ammaj"), 1L).otherwise(0L)).as("d"))
      .withColumn("n", expr("a + b + c + d"))
      .withColumn("r1", expr("a + b"))
      .withColumn("c1", expr("a + c"))
    def binom(m: String, j: String): String =
      s"""CASE WHEN $j = 0 THEN CAST(1 AS BIGINT)
          ELSE aggregate(sequence(1, CAST($j AS INT)), CAST(1 AS BIGINT),
            (acc, i) -> acc * ($m - i + 1) div i) END"""
    val xs = spark.range(0, 32).select(col("id").as("x"))
    cells.crossJoin(broadcast(xs))
      .filter(expr("x >= greatest(CAST(0 AS BIGINT), c1 - (n - r1))" +
        " AND x <= least(r1, c1)"))
      .withColumn("wx",
        expr(s"${binom("r1", "x")} * ${binom("(n - r1)", "(c1 - x)")}"))
      .withColumn("wa",
        expr(s"${binom("r1", "a")} * ${binom("(n - r1)", "(c1 - a)")}"))
      .groupBy("event_type", "a", "b", "c", "d")
      .agg(sum(when(col("wx") <= col("wa"), col("wx")).otherwise(0L))
          .as("num"),
        sum(col("wx")).as("den"))
      .select(col("event_type"), col("a"), col("b"), col("c"), col("d"),
        col("num"), col("den"),
        expr("num * 1000000 div den").as("p6"),
        expr("CASE WHEN b * c = 0 THEN CAST(-1 AS BIGINT)" +
          " ELSE a * d * 10000 div (b * c) END").as("odds4"))
      .orderBy("event_type")
  }

  /** Shewhart individuals / moving-range (XmR) control chart (Shewhart
    * 1931; Wheeler's "process behavior chart" — the SPC default when
    * there is one observation per period): daily revenue-cents totals
    * per event type as the individuals series, mR̄ = mean |xᵢ − xᵢ₋₁|,
    * natural process limits x̄ ± 2.66·mR̄ (2.66 = 3/d₂ at d₂ = 1.128 —
    * carried as the RATIONAL 266/100, no float). Out-of-control points
    * are counted with the fully-cleared integer rule
    * 100·(n−1)·|x·n − Σx| > 266·n·ΣmR through DECIMAL(38,0)/HUGEINT —
    * exact at the boundary; the reported center/limits are the usual
    * ×10⁴ truncating projections. Complements [[statsCusum]]: CUSUM
    * finds small sustained shifts, XmR flags individual excursions.
    * Scale shape: the corpus reduces once to (type, day) bins; the lag
    * window and the per-type combine run on the bounded bin relation;
    * the ≤|types| summary broadcasts back for the ooc count. */
  protected def statsXmr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val dec38 = DecimalType(38, 0)
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("c"))
      .groupBy("event_type", "day").agg(sum(col("c")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val mr = daily.withColumn("m",
      abs(col("x") - lag(col("x"), 1).over(w)))
    val a = mr.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("m")).as("smr"))
    val ooc = mr.join(broadcast(a), "event_type")
      .groupBy("event_type")
      .agg(sum(when(col("n") >= 2 &&
        abs(col("x").cast(dec38) * col("n") - col("sx")) * 100
          * (col("n") - 1) >
          col("smr").cast(dec38) * 266 * col("n"), 1L).otherwise(0L))
        .as("n_ooc"))
    // Sign-split center4 (sx may be negative for negative daily sums;
    // Spark div truncates, DuckDB // floors — they agree only on
    // non-negative operands). mrbar4 is a sum of abs moving ranges, so
    // it and the ±2.66·mrbar spread are always non-negative.
    val center4 = "CASE WHEN sx < 0 THEN -((-sx) * 10000 div n) " +
      "ELSE sx * 10000 div n END"
    a.join(ooc, "event_type")
      .select(col("event_type"), col("n").as("n_days"),
        expr(center4).as("center4"),
        expr("CASE WHEN n < 2 THEN CAST(-1 AS BIGINT) " +
          "ELSE smr * 10000 div (n - 1) END").as("mrbar4"),
        expr("CASE WHEN n < 2 THEN CAST(-1 AS BIGINT) " +
          s"ELSE $center4 " +
          "+ (smr * 10000 div (n - 1)) * 266 div 100 END").as("ucl4"),
        expr("CASE WHEN n < 2 THEN CAST(-1 AS BIGINT) " +
          s"ELSE $center4 " +
          "- (smr * 10000 div (n - 1)) * 266 div 100 END").as("lcl4"),
        col("n_ooc"))
      .orderBy("event_type")
  }

  /** TOST equivalence test (Schuirmann 1987, two one-sided tests — the
    * experimentation decision [[statsWelch]] cannot make: "the morning
    * and afternoon revenue processes are the SAME to within ±5%", the
    * non-inferiority call every do-no-harm launch gate needs): am vs
    * pm daily revenue totals per event type (the [[statsEffectSize]]
    * samples, floored to DOLLAR grain so every cleared product fits
    * HUGEINT/DECIMAL(38,0)), margin δ = 5% of the average of the two
    * means, large-sample z at the RATIONAL critical values 1.645 =
    * 329/200 (one-sided, z² = 108241/40000) and 1.96 = 49/25
    * (two-sided, z² = 9604/625). Every decision is a fully-cleared
    * integer inequality — with A = 40·(S₁n₂ − S₂n₁) and
    * B = S₁n₂ + S₂n₁ (so d±δ ∝ A±B over 40·n₁n₂), equivalence needs
    * BOTH (A+B) > 0 ∧ (A+B)²·25·(n₁−1)(n₂−1) > 108241·N_se and the
    * mirrored (B−A) arm, where N_se/U is Welch's se² on the shared
    * denominator U = n₁²(n₁−1)·n₂²(n₂−1) = D²·(n₁−1)(n₂−1), D = n₁n₂ —
    * the inequalities are stated with the common D² factor cancelled,
    * keeping every cleared product ~D² (≈10¹⁰ at sf0.01) below
    * DECIMAL(38,0)/HUGEINT capacity. The two-sided difference test
    * clears to d²·625·(n₁−1)(n₂−1) > 9604·N_se. Both ratio columns
    * (d6, delta6) are sign-split so Spark's truncating div and DuckDB's
    * flooring // agree for negative daily sums too. Verdict quadrant:
    * equivalent /
    * different / inconclusive / equivalent_and_different (tiny-but-
    * nonzero shift inside the margin). Scale shape: corpus reduces
    * once to (type, day, half) bins; everything after is a ≤|types|
    * relation. */
  protected def statsTost(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val dec = DecimalType(38, 0)
    val daily = t(spark, dir, "events")
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"),
        (expr(s"(ts div $hourNs) % 24") < 12).as("am"),
        floor(col("value")).cast("long").as("d"))
      .groupBy("event_type", "day", "am")
      .agg(sum(col("d")).as("v"))
    val m = daily.groupBy("event_type").agg(
      sum(when(col("am"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("am"), col("v")).otherwise(0L)).cast(dec).as("s1"),
      sum(when(col("am"), col("v").cast(dec) * col("v"))
        .otherwise(lit(0).cast(dec))).as("q1"),
      sum(when(!col("am"), 1L).otherwise(0L)).as("n2"),
      sum(when(!col("am"), col("v")).otherwise(0L)).cast(dec).as("s2"),
      sum(when(!col("am"), col("v").cast(dec) * col("v"))
        .otherwise(lit(0).cast(dec))).as("q2"))
    m.select(col("event_type"), col("n1"), col("n2"),
        expr("s1 * n2 - s2 * n1").as("dnum"),
        expr("s1 * n2 + s2 * n1").as("b"),
        expr("CAST(n1 AS DECIMAL(38,0)) * n2").as("dd"),
        expr("""(CAST(n1 AS DECIMAL(38,0)) * q1 - s1 * s1)
            * n2 * n2 * (n2 - 1)
          + (CAST(n2 AS DECIMAL(38,0)) * q2 - s2 * s2)
            * n1 * n1 * (n1 - 1)""").as("nse"),
        // U = n1²(n1−1)·n2²(n2−1) = D²·(n1−1)(n2−1), so every decision
        // inequality below is divided through by D² = (n1·n2)² > 0:
        // identical verdicts, but the cleared products shrink by ~D²
        // (~10¹⁸ at sf0.01) — without this, (40·dnum+b)²·25·U pressed
        // DECIMAL(38,0) capacity, where Spark non-ANSI yields NULL
        // (silent 'inconclusive') while DuckDB HUGEINT raises.
        expr("""CAST(n1 - 1 AS DECIMAL(38,0)) * (n2 - 1)""").as("uu"))
      .select(col("event_type"), col("n1"), col("n2"),
        // Sign split: Spark div truncates, DuckDB // floors — they
        // agree only on non-negative operands.
        expr("""CAST(CASE WHEN dnum < 0
            THEN -((-dnum) * 1000000 div dd)
            ELSE dnum * 1000000 div dd END AS BIGINT)""").as("d6"),
        expr("""CAST(CASE WHEN b < 0
            THEN -((-b) * 1000000 div (40 * dd))
            ELSE b * 1000000 div (40 * dd) END AS BIGINT)""").as("delta6"),
        expr("""CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0 AS BIGINT)
            WHEN (40 * dnum + b) > 0
              AND (40 * dnum + b) * (40 * dnum + b) * 25 * uu
                > 108241 * nse
              AND (b - 40 * dnum) > 0
              AND (b - 40 * dnum) * (b - 40 * dnum) * 25 * uu
                > 108241 * nse
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END""")
          .as("equivalent"),
        expr("""CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0 AS BIGINT)
            WHEN dnum * dnum * 625 * uu > 9604 * nse
            THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END""")
          .as("different"))
      .select(col("event_type"), col("n1"), col("n2"), col("d6"),
        col("delta6"), col("equivalent"), col("different"),
        expr("""CASE WHEN n1 < 2 OR n2 < 2 THEN 'insufficient'
            WHEN equivalent = 1 AND different = 1
              THEN 'equivalent_and_different'
            WHEN equivalent = 1 THEN 'equivalent'
            WHEN different = 1 THEN 'different'
            ELSE 'inconclusive' END""").as("verdict"))
      .orderBy("event_type")
  }

  /** Empirical-Bayes rate shrinkage (the beta-binomial "add-m
    * pseudo-counts at the global rate" estimator — Efron & Morris
    * 1975's lesson operationalized the way every ranking dashboard
    * should: a 3-customer nation at 100 % activity must NOT outrank a
    * 3000-customer nation at 70 %): per-nation active-customer rate
    * (has ≥ 1 order) shrunk toward the global rate with m = 100
    * pseudo-customers, shrunk₆ = (x·N + 100·X)·10⁶ div (N·(n+100)) —
    * one truncating division over DECIMAL(38,0) products, exact.
    * Reports both rankings; the rank flips ARE the operator's point.
    * Scale shape: one left-semi to flag active customers, one nation
    * aggregate, the ≤|nations| relation broadcasts its own total and
    * ranks in a bounded window. */
  protected def statsEbShrink(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val active = t(spark, dir, "customer")
      .join(t(spark, dir, "orders").select(col("o_custkey")).distinct(),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_nationkey"))
      .groupBy(col("c_nationkey").cast("long").as("nat"))
      .agg(count(lit(1)).as("x"))
    val nations = t(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nat"))
      .agg(count(lit(1)).as("n"))
      .join(active, Seq("nat"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    val tot = nations.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"))
    val sc = nations.crossJoin(broadcast(tot))
      .select(col("nat"), col("n"), col("x"),
        expr("x * 1000000 div n").as("raw6"),
        expr("""CAST((CAST(x AS DECIMAL(38,0)) * nn + CAST(100 AS DECIMAL(38,0)) * xx)
            * 1000000
            div (CAST(nn AS DECIMAL(38,0)) * (n + 100)) AS BIGINT)""")
          .as("shrunk6"))
    sc.select(col("nat"), col("n"), col("x"), col("raw6"), col("shrunk6"),
        row_number().over(Window.orderBy(col("raw6").desc, col("nat")))
          .cast("long").as("rank_raw"),
        row_number().over(Window.orderBy(col("shrunk6").desc, col("nat")))
          .cast("long").as("rank_shrunk"))
      .orderBy("nat")
  }

  /** Hodges–Lehmann pseudomedian (Hodges & Lehmann 1963, "Estimates of
    * location based on rank tests" — the location estimator dual to the
    * Wilcoxon signed-rank test [[statsSignedRank]] pins: the median of
    * all Walsh averages (xᵢ+xⱼ)/2, i ≤ j, with ~29% breakdown and near
    *-full efficiency at the normal): per event type over the daily
    * cent-sum series. Exactness: Walsh SUMS stay integer (halving is
    * deferred), the two middle order statistics are rank-selected from
    * the sorted sums — duplicate sums are harmless because the k-th
    * order VALUE of a multiset needs no tie-break — and the final
    * milli-unit estimate is (lo+hi)·250, exactly (lo+hi)/4·1000. Scale
    * shape: the corpus reduces once to (type, day) bins; the pairwise
    * self-join is O(days²) per type — bounded by the CALENDAR, not the
    * corpus (31 days → 496 Walsh sums), the same day-grain contract as
    * the signed-rank/runs tests. */
  protected def statsHodgesLehmann(spark: SparkSession, dir: String)
  : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(sum(expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).as("x"))
    val pr = daily.as("a")
      .join(daily.as("b"), col("a.event_type") === col("b.event_type")
        && col("a.day") <= col("b.day"))
      .select(col("a.event_type").as("event_type"),
        (col("a.x") + col("b.x")).as("ws"))
    pr.withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("ws")))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy("event_type")))
      .groupBy("event_type")
      .agg(max(col("m")).as("n_pairs"),
        max(when(col("rk") === expr("(m + 1) div 2"), col("ws")))
          .as("hl_lo"),
        max(when(col("rk") === expr("(m + 2) div 2"), col("ws")))
          .as("hl_hi"))
      .select(col("event_type"), col("n_pairs"), col("hl_lo"),
        col("hl_hi"),
        expr("(hl_lo + hl_hi) * 250").as("hl_milli"))
      .orderBy("event_type")
  }

  protected val statsOracleSql: ListMap[String, String] = ListMap(
    "q_stats_hodges_lehmann" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
           FROM events GROUP BY 1, 2),
         pr AS (SELECT a.event_type, a.x + b.x AS ws
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day <= b.day),
         rk AS (SELECT event_type, ws,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY ws)
               AS BIGINT) AS rk,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS m
           FROM pr)
         SELECT event_type, CAST(max(m) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rk = (m + 1) // 2 THEN ws END) AS BIGINT)
             AS hl_lo,
           CAST(max(CASE WHEN rk = (m + 2) // 2 THEN ws END) AS BIGINT)
             AS hl_hi,
           CAST((max(CASE WHEN rk = (m + 1) // 2 THEN ws END)
             + max(CASE WHEN rk = (m + 2) // 2 THEN ws END)) * 250
             AS BIGINT) AS hl_milli
         FROM rk GROUP BY 1 ORDER BY event_type""",
    "q_stats_eb_shrink" ->
      """WITH act AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
             CAST(count(*) AS BIGINT) AS x
           FROM customer
           WHERE c_custkey IN (SELECT o_custkey FROM orders)
           GROUP BY 1),
         nat AS (SELECT CAST(c_nationkey AS BIGINT) AS nat,
             CAST(count(*) AS BIGINT) AS n
           FROM customer GROUP BY 1),
         j AS (SELECT nat.nat, nat.n, coalesce(act.x, 0) AS x
           FROM nat LEFT JOIN act USING (nat)),
         tt AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(x) AS HUGEINT) AS xx FROM j),
         sc AS (SELECT nat, n, x,
             x * 1000000 // n AS raw6,
             CAST((CAST(x AS HUGEINT) * nn + 100 * xx) * 1000000
               // (nn * (n + 100)) AS BIGINT) AS shrunk6
           FROM j, tt)
         SELECT nat, n, x, raw6, shrunk6,
           CAST(row_number() OVER (ORDER BY raw6 DESC, nat) AS BIGINT)
             AS rank_raw,
           CAST(row_number() OVER (ORDER BY shrunk6 DESC, nat) AS BIGINT)
             AS rank_shrunk
         FROM sc ORDER BY nat""",
    "q_stats_tost" ->
      """WITH d AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             (epoch_ns(ts) // 3600000000000) % 24 < 12 AS am,
             CAST(floor(value) AS BIGINT) AS v
           FROM events),
         daily AS (SELECT event_type, day, am,
             CAST(sum(v) AS HUGEINT) AS v
           FROM d GROUP BY 1, 2, 3),
         m AS (SELECT event_type,
             CAST(sum(CASE WHEN am THEN 1 ELSE 0 END) AS HUGEINT) AS n1,
             CAST(sum(CASE WHEN am THEN v ELSE 0 END) AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN am THEN v * v ELSE 0 END) AS HUGEINT)
               AS q1,
             CAST(sum(CASE WHEN am THEN 0 ELSE 1 END) AS HUGEINT) AS n2,
             CAST(sum(CASE WHEN am THEN 0 ELSE v END) AS HUGEINT) AS s2,
             CAST(sum(CASE WHEN am THEN 0 ELSE v * v END) AS HUGEINT)
               AS q2
           FROM daily GROUP BY 1),
         k AS (SELECT event_type, n1, n2,
             s1 * n2 - s2 * n1 AS dnum,
             s1 * n2 + s2 * n1 AS b,
             n1 * n2 AS dd,
             (n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1)
               + (n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1) AS nse,
             (n1 - 1) * (n2 - 1) AS uu
           FROM m),
         f AS (SELECT event_type,
             CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
             CAST(CASE WHEN dnum < 0
               THEN -((-dnum) * 1000000 // dd)
               ELSE dnum * 1000000 // dd END AS BIGINT) AS d6,
             CAST(CASE WHEN b < 0
               THEN -((-b) * 1000000 // (40 * dd))
               ELSE b * 1000000 // (40 * dd) END AS BIGINT) AS delta6,
             CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0 AS BIGINT)
                  WHEN (40 * dnum + b) > 0
                    AND (40 * dnum + b) * (40 * dnum + b) * 25 * uu
                      > 108241 * nse
                    AND (b - 40 * dnum) > 0
                    AND (b - 40 * dnum) * (b - 40 * dnum) * 25 * uu
                      > 108241 * nse
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
               AS equivalent,
             CASE WHEN n1 < 2 OR n2 < 2 THEN CAST(0 AS BIGINT)
                  WHEN dnum * dnum * 625 * uu > 9604 * nse
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
               AS different
           FROM k)
         SELECT event_type, n1, n2, d6, delta6, equivalent, different,
           CASE WHEN n1 < 2 OR n2 < 2 THEN 'insufficient'
                WHEN equivalent = 1 AND different = 1
                  THEN 'equivalent_and_different'
                WHEN equivalent = 1 THEN 'equivalent'
                WHEN different = 1 THEN 'different'
                ELSE 'inconclusive' END AS verdict
         FROM f ORDER BY event_type""",
    "q_stats_xmr" ->
      """WITH d AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
           FROM events),
         daily AS (SELECT event_type, day, CAST(sum(c) AS BIGINT) AS x
           FROM d GROUP BY 1, 2),
         mr AS (SELECT event_type, day, x,
             abs(x - lag(x) OVER (PARTITION BY event_type ORDER BY day))
               AS m
           FROM daily),
         a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(m) AS BIGINT) AS smr
           FROM mr GROUP BY 1),
         o AS (SELECT mr.event_type,
             CAST(sum(CASE WHEN a.n >= 2
               AND abs(CAST(mr.x AS HUGEINT) * a.n - a.sx) * 100
                 * (a.n - 1) > CAST(a.smr AS HUGEINT) * 266 * a.n
               THEN 1 ELSE 0 END) AS BIGINT) AS n_ooc
           FROM mr JOIN a USING (event_type) GROUP BY 1)
         SELECT a.event_type, a.n AS n_days,
           CASE WHEN sx < 0 THEN -((-sx) * 10000 // n)
                ELSE sx * 10000 // n END AS center4,
           CASE WHEN n < 2 THEN CAST(-1 AS BIGINT)
                ELSE smr * 10000 // (n - 1) END AS mrbar4,
           CASE WHEN n < 2 THEN CAST(-1 AS BIGINT)
                ELSE (CASE WHEN sx < 0 THEN -((-sx) * 10000 // n)
                      ELSE sx * 10000 // n END)
                  + (smr * 10000 // (n - 1)) * 266 // 100 END AS ucl4,
           CASE WHEN n < 2 THEN CAST(-1 AS BIGINT)
                ELSE (CASE WHEN sx < 0 THEN -((-sx) * 10000 // n)
                      ELSE sx * 10000 // n END)
                  - (smr * 10000 // (n - 1)) * 266 // 100 END AS lcl4,
           o.n_ooc
         FROM a JOIN o USING (event_type) ORDER BY event_type""",
    // The prefix-min closed form replayed: C = prefix sum of (x - mu),
    // S = C - least(0, prefix min C); argmax = (S, -day) tuple max.
    "q_stats_cusum" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
           FROM events GROUP BY 1, 2),
         mu AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) // count(*) AS BIGINT) AS mu
           FROM daily GROUP BY 1),
         cs AS (SELECT d.event_type, d.day, m.n_days, m.mu,
             CAST(sum(d.x - m.mu) OVER (PARTITION BY d.event_type
               ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS BIGINT) AS c
           FROM daily d JOIN mu m USING (event_type)),
         sv AS (SELECT *, c - least(CAST(0 AS BIGINT),
             min(c) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
           FROM cs)
         SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
           CAST(max(mu) AS BIGINT) AS mu_cents,
           -- (s, -day) lexicographic == the packed key s*2^20 - day while
           -- day < 2^20 (epoch days are ~2*10^4): same argmax as the
           -- engine's struct max.
           CAST(max_by(s, CAST(s AS HUGEINT) * 1048576 - day) AS BIGINT)
             AS max_cusum,
           CAST(max_by(day, CAST(s AS HUGEINT) * 1048576 - day) AS BIGINT)
             AS peak_day,
           CAST(sum(CASE WHEN s > mu THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarm_days
         FROM sv GROUP BY 1 ORDER BY 1""",
    // 200 md5-relabelings replayed verbatim; extremeness via HUGEINT
    // cross-products (== the engine's DECIMAL(38,0) exact comparison).
    "q_stats_perm_test" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             (epoch_ns(ts) // 3600000000000) % 24 < 12 AS am,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2, 3),
         obs AS (SELECT event_type,
             CAST(sum(CASE WHEN am THEN 1 ELSE 0 END) AS BIGINT) AS n_am,
             CAST(sum(CASE WHEN am THEN v ELSE 0 END) AS BIGINT) AS s_am,
             CAST(sum(CASE WHEN am THEN 0 ELSE 1 END) AS BIGINT) AS n_pm,
             CAST(sum(CASE WHEN am THEN 0 ELSE v END) AS BIGINT) AS s_pm
           FROM daily GROUP BY 1),
         lab AS (SELECT d.event_type, d.v, p.p,
             CAST(('0x' || substr(md5(CAST(p.p AS VARCHAR) || '|' ||
               d.event_type || '|' || CAST(d.day AS VARCHAR) || '|' ||
               CASE WHEN d.am THEN '1' ELSE '0' END), 1, 8)) AS BIGINT)
               % 2 AS grp
           FROM daily d, (SELECT unnest(range(200)) AS p) p),
         pr AS (SELECT event_type, p,
             CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN grp = 0 THEN v ELSE 0 END) AS BIGINT) AS sa,
             CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
             CAST(sum(CASE WHEN grp = 1 THEN v ELSE 0 END) AS BIGINT) AS sb
           FROM lab GROUP BY 1, 2),
         ext AS (SELECT pr.event_type,
             CAST(sum(CASE WHEN
                 abs(CAST(sa AS HUGEINT) * nb - CAST(sb AS HUGEINT) * na)
                   * (CAST(n_am AS HUGEINT) * n_pm)
                 >= abs(CAST(s_am AS HUGEINT) * n_pm
                      - CAST(s_pm AS HUGEINT) * n_am)
                   * (CAST(na AS HUGEINT) * nb)
               THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
           FROM pr JOIN obs USING (event_type) GROUP BY 1)
         SELECT event_type, n_am, n_pm,
           CAST(abs(CAST(s_am AS HUGEINT) * n_pm
             - CAST(s_pm AS HUGEINT) * n_am) AS BIGINT) AS obs_cross,
           n_extreme,
           (1 + n_extreme) * 1000000 // 201 AS p_micro
         FROM obs JOIN ext USING (event_type) ORDER BY event_type""",
    "q_stats_effect_size" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             (epoch_ns(ts) // 3600000000000) % 24 < 12 AS am,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2, 3),
         x AS (SELECT event_type, v FROM daily WHERE am),
         y AS (SELECT event_type, v FROM daily WHERE NOT am),
         mx AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sx,
             CAST(sum(v * v) AS BIGINT) AS sxx
           FROM x GROUP BY 1),
         my AS (SELECT event_type, CAST(count(*) AS BIGINT) AS m,
             CAST(sum(v) AS BIGINT) AS sy,
             CAST(sum(v * v) AS BIGINT) AS syy
           FROM y GROUP BY 1),
         pr AS (SELECT a.event_type,
             CAST(sum(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT)
               AS gt,
             CAST(sum(CASE WHEN a.v < b.v THEN 1 ELSE 0 END) AS BIGINT)
               AS lt,
             CAST(count(*) AS BIGINT) AS nm
           FROM x a JOIN y b ON a.event_type = b.event_type GROUP BY 1)
         SELECT mx.event_type, n AS n_am, m AS n_pm,
           sx // n AS mean_am_cents, sy // m AS mean_pm_cents,
           CAST(CASE WHEN n + m - 2 <= 0
                  OR (sxx - CAST(sx AS DOUBLE) * sx / n)
                   + (syy - CAST(sy AS DOUBLE) * sy / m) <= 0 THEN 0
                ELSE CAST(floor(
                  (CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / m)
                  / sqrt(((sxx - CAST(sx AS DOUBLE) * sx / n)
                        + (syy - CAST(sy AS DOUBLE) * sy / m))
                        / (n + m - 2)) * 10000) AS BIGINT) END AS BIGINT)
             AS cohen_d4,
           CAST(floor(CAST(gt - lt AS DOUBLE) * 10000 / nm) AS BIGINT)
             AS cliff_delta4
         FROM mx JOIN my ON mx.event_type = my.event_type
           JOIN pr ON mx.event_type = pr.event_type
         ORDER BY mx.event_type""",
    "q_stats_fisher_exact" ->
      """WITH e AS (SELECT event_type,
             (epoch_ns(ts) // 86400000000000) % 31 AS ph,
             (epoch_ns(ts) // 3600000000000) % 24 < 12 AS am
           FROM events),
         pr AS (SELECT event_type, ph,
             CAST(sum(CASE WHEN am THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(sum(CASE WHEN am THEN 0 ELSE 1 END) AS BIGINT) AS np
           FROM e GROUP BY 1, 2),
         fl AS (SELECT event_type, ph < 16 AS early, na > np AS ammaj
           FROM pr),
         cells AS (SELECT event_type,
             CAST(sum(CASE WHEN early AND ammaj THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN early AND NOT ammaj THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(sum(CASE WHEN NOT early AND ammaj THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(sum(CASE WHEN NOT early AND NOT ammaj THEN 1 ELSE 0 END)
               AS BIGINT) AS d
           FROM fl GROUP BY 1),
         mg AS (SELECT *, a + b + c + d AS n, a + b AS r1, a + c AS c1
           FROM cells),
         sup AS (SELECT mg.*, j.j AS x
           FROM mg, generate_series(0, 31) j(j)
           WHERE j.j >= greatest(0, c1 - (n - r1))
             AND j.j <= least(r1, c1)),
         w AS (SELECT *,
             CAST(factorial(r1::INT)
                 // (factorial(x::INT) * factorial((r1 - x)::INT))
               * (factorial((n - r1)::INT)
                 // (factorial((c1 - x)::INT)
                    * factorial((n - r1 - (c1 - x))::INT))) AS BIGINT)
               AS wx,
             CAST(factorial(r1::INT)
                 // (factorial(a::INT) * factorial((r1 - a)::INT))
               * (factorial((n - r1)::INT)
                 // (factorial((c1 - a)::INT)
                    * factorial((n - r1 - (c1 - a))::INT))) AS BIGINT)
               AS wa
           FROM sup)
         SELECT event_type, a, b, c, d,
           CAST(sum(CASE WHEN wx <= wa THEN wx ELSE 0 END) AS BIGINT)
             AS num,
           CAST(sum(wx) AS BIGINT) AS den,
           CAST(sum(CASE WHEN wx <= wa THEN wx ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(sum(wx) AS BIGINT) AS p6,
           CAST(CASE WHEN b * c = 0 THEN -1
                ELSE a * d * 10000 // (b * c) END AS BIGINT) AS odds4
         FROM w GROUP BY event_type, a, b, c, d ORDER BY event_type""",
    // Exact-integer replay: HUGEINT factorials give the same binomial
    // prefix sums the Spark fold's integer recurrence produces; the
    // static 0..31 series stands in for the correlated generate_series
    // DuckDB rejects.
    "q_stats_sign_bh" ->
      """WITH e AS (SELECT event_type,
             (epoch_ns(ts) // 86400000000000) % 31 AS ph,
             (epoch_ns(ts) // 3600000000000) % 24 < 12 AS am
           FROM events),
         pr AS (SELECT event_type, ph,
             CAST(sum(CASE WHEN am THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN am THEN 0 ELSE 1 END) AS BIGINT) AS b
           FROM e GROUP BY 1, 2),
         tst AS (SELECT event_type,
             CAST(sum(CASE WHEN a <> b THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a > b THEN 1 ELSE 0 END) AS BIGINT) AS k
           FROM pr GROUP BY 1),
         sm AS (SELECT w.event_type, w.n, w.k,
             CAST(sum(factorial(w.n::INT) //
               (factorial(j.j::INT) * factorial((w.n - j.j)::INT)))
               AS BIGINT) AS s_m
           FROM (SELECT event_type, n, k, least(k, n - k) AS m FROM tst) w,
             generate_series(0, 31) j(j)
           WHERE j.j <= w.m GROUP BY 1, 2, 3),
         p AS (SELECT event_type, n, k,
             least(2 * s_m, 1::BIGINT << n::INT) AS pn,
             (1::BIGINT << n::INT) AS den,
             least(2 * s_m, 1::BIGINT << n::INT)
               * (1::BIGINT << (31 - n)::INT) AS p_scaled
           FROM sm),
         rkd AS (SELECT *,
             CAST(row_number() OVER (ORDER BY p_scaled, event_type)
               AS BIGINT) AS rk,
             (SELECT CAST(count(*) AS BIGINT) FROM p) AS mt
           FROM p),
         cond AS (SELECT *,
             20 * mt * p_scaled <= rk * (1::BIGINT << 31) AS c
           FROM rkd),
         cut AS (SELECT max(CASE WHEN c THEN rk END) AS cut FROM cond)
         SELECT event_type, n, k, pn, den,
           p_scaled * 1000000 // (1::BIGINT << 31) AS p6,
           rk AS bh_rank,
           CAST(CASE WHEN rk <= coalesce((SELECT cut FROM cut), 0)
                THEN 1 ELSE 0 END AS BIGINT) AS reject
         FROM cond ORDER BY bh_rank""",
    // Every statistic rebuilt from the same (column, value) unpivot; the
    // MCV tie-break replays as a struct max on (count, value).
    "q_stats_analyze" ->
      """WITH u AS (
           SELECT 'l_returnflag' AS col_name, l_returnflag AS v FROM lineitem
           UNION ALL
           SELECT 'l_linestatus', l_linestatus FROM lineitem
           UNION ALL
           SELECT 'l_quantity',
             CAST(CAST(floor(l_quantity) AS BIGINT) AS VARCHAR) FROM lineitem
           UNION ALL
           SELECT 'rf_nullable', nullif(l_returnflag, 'N') FROM lineitem),
         vc AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS n
                FROM u GROUP BY col_name, v),
         s AS (SELECT col_name,
                 CAST(sum(n) AS BIGINT) AS n_rows,
                 CAST(count(CASE WHEN v IS NOT NULL THEN 1 END) AS BIGINT)
                   AS ndv,
                 CAST(COALESCE(sum(CASE WHEN v IS NULL THEN n END), 0)
                   AS BIGINT) AS n_null,
                 max(CASE WHEN v IS NOT NULL
                     THEN {'n': n, 'v': v} END) AS m
               FROM vc GROUP BY col_name)
         SELECT col_name, n_rows, ndv, n_null, m.v AS mcv, m.n AS mcv_n
         FROM s ORDER BY col_name""",
    "q_stats_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS lo,
                 max(l_extendedprice) AS hi FROM lineitem),
         b AS (SELECT CAST(least(floor((l.l_extendedprice - mm.lo) * 8.0
                 / (mm.hi - mm.lo)), 7) AS BIGINT) AS bin,
                 l.l_extendedprice AS v, mm.lo, mm.hi
               FROM lineitem l, mm)
         SELECT bin,
           floor((min(lo) + bin * (min(hi) - min(lo)) / 8.0) * 100 + 0.5)
             / 100 AS edge_lo,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(v AS DECIMAL(22,6))) AS DOUBLE) AS sum_price
         FROM b GROUP BY bin ORDER BY bin""",
    // Quartile thresholds via the proven quantile_cont pairing on integer
    // cents; binning is the same row-local CASE.
    "q_stats_histogram_eqdepth" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
               AS c FROM lineitem),
         q AS (SELECT
             CAST(floor(quantile_cont(c, 0.25) + 0.5) AS BIGINT) AS q1,
             CAST(floor(quantile_cont(c, 0.5) + 0.5) AS BIGINT) AS q2,
             CAST(floor(quantile_cont(c, 0.75) + 0.5) AS BIGINT) AS q3
           FROM c),
         b AS (SELECT CASE WHEN c.c <= q.q1 THEN 0
                 WHEN c.c <= q.q2 THEN 1
                 WHEN c.c <= q.q3 THEN 2 ELSE 3 END AS bin, c.c
               FROM c, q)
         SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n,
           min(c) AS lo_cents, max(c) AS hi_cents
         FROM b GROUP BY bin ORDER BY bin""",
    // GENERATED pairwise-corr replay: same cent quantization, HUGEINT
    // sums, and fixed double-op order (num→dbl / sqrt(da→dbl · db→dbl)).
    "q_stats_corr" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val qCols = cs.zipWithIndex.map { case (c, i) =>
        s"CAST(floor($c * 100 + 0.5) AS HUGEINT) AS c$i" }.mkString(", ")
      val pairs = for { i <- cs.indices; j <- cs.indices if i < j } yield (i, j)
      val sums = (cs.indices.map(i => s"sum(c$i) AS s$i") ++
        cs.indices.map(i => s"sum(c$i * c$i) AS q$i") ++
        pairs.map { case (i, j) => s"sum(c$i * c$j) AS p${i}_$j" })
        .mkString(", ")
      val rows = pairs.map { case (i, j) =>
        s"""SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b,
             CASE WHEN n * q$i - s$i * s$i = 0 OR n * q$j - s$j * s$j = 0
               THEN 0.0
               ELSE floor(CAST(n * p${i}_$j - s$i * s$j AS DOUBLE)
                 / sqrt(CAST(n * q$i - s$i * s$i AS DOUBLE)
                        * CAST(n * q$j - s$j * s$j AS DOUBLE))
                 * 1000000) / 1000000 END AS corr6
           FROM st""" }.mkString(" UNION ALL ")
      s"""WITH qq AS (SELECT $qCols FROM lineitem),
          st AS (SELECT CAST(count(*) AS HUGEINT) AS n, $sums FROM qq)
        SELECT * FROM ($rows) ORDER BY col_a, col_b"""
    },
    // Same 4dp quality replay as q_llm_quality, cleared-denominator
    // integer CDF distance, one floored division at the end.
    "q_stats_ks_quality" ->
      """WITH m0 AS (SELECT source,
           CAST(length(text) AS DOUBLE) AS nchars,
           CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS ntok,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
           CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is','that','it','for',
                        'der','die','das','und','ist','von','zu','mit','auf','ein',
                        'le','la','les','de','et','est','un','une','que','pour',
                        'el','los','y','es','por'))) AS DOUBLE) AS sw
           FROM documents WHERE source IN ('src0', 'src1')),
         m AS (SELECT source, CAST(floor((
             (CASE WHEN nchars >= 200 AND nchars <= 2000 THEN 1.0
                   WHEN nchars >= 50 THEN 0.5 ELSE 0.0 END) * 0.3
             + (CASE WHEN nchars > 0 THEN alpha / nchars ELSE 0.0 END) * 0.3
             + least((CASE WHEN ntok > 0 THEN sw / ntok ELSE 0.0 END) * 5.0, 1.0) * 0.2
             + (CASE WHEN ntok > 0 AND nchars / ntok >= 3 AND nchars / ntok <= 12
                     THEN 1.0 ELSE 0.0 END) * 0.2) * 10000 + 0.5) AS BIGINT) AS q4
           FROM m0),
         pts AS (SELECT q4,
             sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS a,
             sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS b
           FROM m GROUP BY q4),
         cum AS (SELECT q4,
             CAST(sum(a) OVER (ORDER BY q4
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             CAST(sum(b) OVER (ORDER BY q4
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb
           FROM pts),
         nn AS (SELECT CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                       CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2
                FROM m)
         SELECT n1, n2, q4 AS ks_at_q4,
           floor(abs(ca * n2 - cb * n1) * 1000000.0 / (n1 * n2)) / 1000000 AS ks6
         FROM cum, nn
         ORDER BY abs(ca * n2 - cb * n1) DESC, q4 LIMIT 1""",
    // Benford replay: same integer cents, string-head digit, and the same
    // 6 dp pre-floored log10(1+1/d) constants; HUGEINT numerator, one
    // division per digit.
    "q_stats_benford" ->
      """WITH c AS (SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
             AS c FROM lineitem),
         d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER)
                 AS digit, CAST(count(*) AS BIGINT) AS n_obs
               FROM c WHERE c > 0 GROUP BY 1),
         n AS (SELECT CAST(sum(n_obs) AS HUGEINT) AS n FROM d),
         e(digit, c6) AS (VALUES (1, 301029), (2, 176091), (3, 124938),
           (4, 96910), (5, 79181), (6, 66946), (7, 57991), (8, 51152),
           (9, 45757))
         SELECT d.digit, d.n_obs,
           CAST(n.n * e.c6 AS BIGINT) AS expected_micro,
           FLOOR(CAST((CAST(d.n_obs AS HUGEINT) * 1000000 - n.n * e.c6)
                   * (CAST(d.n_obs AS HUGEINT) * 1000000 - n.n * e.c6)
                 AS DOUBLE)
             / CAST(n.n * e.c6 * 1000000 AS DOUBLE) * 1e6) / 1e6 AS contrib6
         FROM d JOIN e ON e.digit = d.digit, n ORDER BY d.digit""",
    // Cramér's V replay: same cell/margin relations, same cleared-
    // denominator per-cell floor, same single sqrt.
    "q_stats_cramers_v" ->
      """WITH cells AS (SELECT o_orderstatus AS s, o_orderpriority AS p,
                CAST(count(*) AS BIGINT) AS o_ij FROM orders GROUP BY 1, 2),
         rm AS (SELECT s, CAST(sum(o_ij) AS BIGINT) AS r FROM cells
                GROUP BY 1),
         cm AS (SELECT p, CAST(sum(o_ij) AS BIGINT) AS c FROM cells
                GROUP BY 1),
         tot AS (SELECT CAST(sum(o_ij) AS BIGINT) AS n,
                   count(DISTINCT s) AS nr, count(DISTINCT p) AS nc
                 FROM cells),
         contrib AS (SELECT
             CAST(FLOOR(CAST(
                 (CAST(n AS HUGEINT) * o_ij - CAST(r AS HUGEINT) * c)
                 * (CAST(n AS HUGEINT) * o_ij - CAST(r AS HUGEINT) * c)
               AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * r * c AS DOUBLE) * 1e6)
               AS BIGINT) AS contrib6,
             n, nr, nc
           FROM cells JOIN rm USING (s) JOIN cm USING (p), tot)
         SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(contrib6) AS BIGINT) AS chi2_micro,
           FLOOR(sqrt(CAST(sum(contrib6) AS DOUBLE) / 1e6
             / (CAST(n AS DOUBLE) * least(nr - 1, nc - 1))) * 1e6) / 1e6
             AS v6
         FROM contrib GROUP BY n, nr, nc""",
    // Mann–Whitney replay: same distinct-value relation, doubled-U integer
    // form, exact tie-corrected variance, one sqrt + division.
    "q_stats_ranksum" ->
      """WITH vals AS (SELECT CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)
             AS v,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
               AS BIGINT) AS n1v,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2v
           FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY 1),
         st AS (SELECT v, n1v, n2v,
                  COALESCE(CAST(sum(n2v) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS cum2
                FROM vals),
         agg AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
                   CAST(sum(n2v) AS BIGINT) AS n2,
                   CAST(sum(CAST(n1v AS HUGEINT) * 2 * cum2
                     + CAST(n1v AS HUGEINT) * n2v) AS HUGEINT) AS u2,
                   CAST(sum(CAST(n1v + n2v AS HUGEINT) * (n1v + n2v)
                     * (n1v + n2v) - (n1v + n2v)) AS HUGEINT) AS ties
                 FROM st)
         SELECT n1, n2, CAST(u2 AS DOUBLE) AS u2,
           FLOOR(CAST(u2 - CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
             / (2 * sqrt(
                 CAST(CAST(n1 AS HUGEINT) * n2
                   * ((CAST(n1 AS HUGEINT) + n2 + 1)
                      * (CAST(n1 AS HUGEINT) + n2)
                      * (CAST(n1 AS HUGEINT) + n2 - 1) - ties) AS DOUBLE)
               / CAST(12 * (CAST(n1 AS HUGEINT) + n2)
                   * (CAST(n1 AS HUGEINT) + n2 - 1) AS DOUBLE)))
             * 1e6) / 1e6 AS z6
         FROM agg""",
    // Entropy replay: same per-distinct-value floor-then-sum integer
    // micro-units, same truncating division.
    "q_stats_entropy" ->
      """WITH os AS (SELECT count(*) AS cnt FROM orders
                     GROUP BY o_orderstatus),
         op AS (SELECT count(*) AS cnt FROM orders
                GROUP BY o_orderpriority),
         lr AS (SELECT count(*) AS cnt FROM lineitem
                GROUP BY l_returnflag),
         u AS (
           SELECT 'orders.o_orderstatus' AS col_name,
             CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1e6) AS HUGEINT)
               * cnt) AS HUGEINT) AS se
           FROM os
           UNION ALL
           SELECT 'orders.o_orderpriority',
             CAST(sum(cnt) AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1e6) AS HUGEINT)
               * cnt) AS HUGEINT)
           FROM op
           UNION ALL
           SELECT 'lineitem.l_returnflag',
             CAST(sum(cnt) AS BIGINT), CAST(count(*) AS BIGINT),
             CAST(sum(CAST(FLOOR(ln(CAST(cnt AS DOUBLE)) * 1e6) AS HUGEINT)
               * cnt) AS HUGEINT)
           FROM lr)
         SELECT col_name, n, n_distinct,
           CAST((CAST(FLOOR(ln(CAST(n AS DOUBLE)) * 1e6) AS HUGEINT) * n
             - se) // n AS BIGINT) AS h_micro
         FROM u ORDER BY col_name""",
    // Autocorrelation replay: same integer count series, same adjacent-
    // minute pairing, same HUGEINT moments and single division + sqrt.
    "q_stats_autocorr" ->
      """WITH bins AS (SELECT epoch_ns(ts) // 60000000000 AS bin,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         p0 AS (SELECT bin, x,
                  lead(bin) OVER (ORDER BY bin) AS nb,
                  lead(x) OVER (ORDER BY bin) AS y
                FROM bins),
         pr AS (SELECT x, y FROM p0 WHERE nb = bin + 1),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
               FROM pr)
         SELECT n,
           FLOOR(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
             * 1e6) / 1e6 AS r1_6
         FROM m""",
    // Gini replay: the oracle takes the global-window luxury (plain
    // row_number over the full order); the engine's bucketed two-pass
    // rank composes to the identical total order (v, custkey).
    "q_stats_gini" ->
      """WITH rev AS (SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS v
           FROM orders GROUP BY 1),
         rk AS (SELECT v, CAST(row_number() OVER (ORDER BY v, o_custkey)
                  AS BIGINT) AS r
                FROM rev),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(r AS HUGEINT) * v) AS HUGEINT) AS srx
               FROM rk)
         SELECT n, CAST(sx AS DOUBLE) / 100 AS total_revenue,
           FLOOR(CAST(2 * srx - (CAST(n AS HUGEINT) + 1) * sx AS DOUBLE)
             / CAST(CAST(n AS HUGEINT) * sx AS DOUBLE) * 1e6) / 1e6
             AS gini6
         FROM m""",
    // Spearman replay: same doubled tie-averaged ranks from the
    // distinct-value relations, same HUGEINT moments, single division.
    "q_stats_spearman" ->
      """WITH base AS (SELECT
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS y
           FROM lineitem),
         rx AS (SELECT x, (2 * COALESCE(CAST(sum(cnt) OVER (ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) + cnt + 1) AS rx
           FROM (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM base
                 GROUP BY 1)),
         ry AS (SELECT y, (2 * COALESCE(CAST(sum(cnt) OVER (ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) + cnt + 1) AS ry
           FROM (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM base
                 GROUP BY 1)),
         j AS (SELECT rx.rx, ry.ry FROM base
               JOIN rx USING (x) JOIN ry USING (y)),
         m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(sum(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(sum(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy,
                 CAST(sum(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
                 CAST(sum(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy
               FROM j)
         SELECT n,
           FLOOR(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE))
             * 1e6) / 1e6 AS rho6
         FROM m""",
    // Kendall replay: same contingency cells, same doubled tie-corrected
    // denominators (the ×2e6 factor restores the halved n0/T terms).
    "q_stats_kendall" ->
      """WITH cells AS (SELECT
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS y,
             CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2),
         cd AS (SELECT
             CAST(COALESCE(sum(CASE WHEN a.y < b.y
               THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END), 0) AS HUGEINT)
               AS cc,
             CAST(COALESCE(sum(CASE WHEN a.y > b.y
               THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END), 0) AS HUGEINT)
               AS dd
           FROM cells a JOIN cells b ON a.x < b.x),
         tx AS (SELECT CAST(sum(CAST(r AS HUGEINT) * (r - 1)) AS HUGEINT)
                  AS tx2
                FROM (SELECT CAST(sum(c) AS BIGINT) AS r FROM cells
                      GROUP BY x)),
         ty AS (SELECT CAST(sum(CAST(r AS HUGEINT) * (r - 1)) AS HUGEINT)
                  AS ty2
                FROM (SELECT CAST(sum(c) AS BIGINT) AS r FROM cells
                      GROUP BY y)),
         nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
         SELECT n, CAST(cc AS DOUBLE) AS concordant,
           CAST(dd AS DOUBLE) AS discordant,
           FLOOR(CAST(cc - dd AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - tx2 AS DOUBLE)
                  * CAST(CAST(n AS HUGEINT) * (n - 1) - ty2 AS DOUBLE))
             * 2000000) / 1e6 AS tau6
         FROM cd, tx, ty, nn""",
    // Jackknife replay: same md5 buckets, same integer leave-one-out
    // means, same cleared-denominator variance under one sqrt.
    "q_stats_jackknife" ->
      """WITH r AS (SELECT
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS x,
             CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
               || CAST(l_linenumber AS VARCHAR)), 1, 8)) AS BIGINT) % 32
               AS bk
           FROM lineitem),
         per AS (SELECT bk, CAST(count(*) AS BIGINT) AS ni,
                   CAST(sum(x) AS BIGINT) AS si
                 FROM r GROUP BY 1),
         tot AS (SELECT CAST(sum(ni) AS BIGINT) AS n,
                   CAST(sum(si) AS BIGINT) AS s FROM per),
         loo AS (SELECT (CAST(s - si AS HUGEINT) * 1000000) // (n - ni)
                   AS m, n, s
                 FROM per, tot),
         agg AS (SELECT n, s, CAST(count(*) AS BIGINT) AS nb,
                   CAST(sum(CAST(m AS HUGEINT)) AS HUGEINT) AS sm,
                   CAST(sum(CAST(m AS HUGEINT) * m) AS HUGEINT) AS sm2
                 FROM loo GROUP BY n, s)
         SELECT CAST(n AS BIGINT) AS n_rows, nb AS n_blocks,
           CAST((CAST(s AS HUGEINT) * 1000000) // n AS BIGINT)
             AS mean_micro,
           CAST(FLOOR(sqrt(CAST(31 * (32 * sm2 - sm * sm) AS DOUBLE))
             / 32) AS BIGINT) AS se_jk_micro
         FROM agg""",
    // Runs-test replay: same lower median, same tie-drop, same
    // edge-detect run count, same cleared z under one sqrt.
    "q_stats_runs_test" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         med AS (SELECT x AS med FROM (
             SELECT x, row_number() OVER (ORDER BY x, day) AS rk FROM days)
           WHERE rk = (SELECT (count(*) + 1) // 2 FROM days)),
         sg AS (SELECT day, x,
                  CASE WHEN x > med THEN 1 ELSE 0 END AS above
                FROM days, med WHERE x <> med),
         ch AS (SELECT above,
                  CASE WHEN COALESCE(lag(above) OVER (ORDER BY day),
                    above) <> above THEN 1 ELSE 0 END AS chg,
                  med
                FROM sg, med),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(above) AS BIGINT) AS n1,
                   CAST(sum(1 - above) AS BIGINT) AS n2,
                   CAST(sum(chg) + 1 AS BIGINT) AS runs,
                   CAST(min(med) AS BIGINT) AS med
                 FROM ch)
         SELECT n AS n_days, med AS median_volume, n1 AS n_above,
           n2 AS n_below, runs AS n_runs,
           FLOOR(CAST(CAST(n AS HUGEINT) * (runs - 1)
               - 2 * CAST(n1 AS HUGEINT) * n2 AS DOUBLE)
             / sqrt(CAST(2 * CAST(n1 AS HUGEINT) * n2
                 * (2 * CAST(n1 AS HUGEINT) * n2 - n) AS DOUBLE)
               / (CAST(n AS DOUBLE) - 1))
             * 1e4) / 1e4 AS z4
         FROM agg""",
    // Mann–Kendall replay: same integer S over the bounded pair sweep,
    // same tie-corrected variance, same ±1 continuity correction.
    "q_stats_mann_kendall" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         pairs AS (SELECT
             CASE WHEN b.x > a.x THEN 1
                  WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn,
             CAST(FLOOR(CAST(b.x - a.x AS DOUBLE) * 1e6
               / (b.day - a.day)) AS BIGINT) AS slope6
           FROM days a JOIN days b ON a.day < b.day),
         sv AS (SELECT CAST(COALESCE(sum(sgn), 0) AS BIGINT) AS s,
                  CAST(count(*) AS BIGINT) AS p
                FROM pairs),
         sen AS (SELECT slope6 AS sen_slope_micro FROM (
             SELECT slope6, row_number() OVER (ORDER BY slope6) AS rk
             FROM pairs)
           WHERE rk = (SELECT (p + 1) // 2 FROM sv)),
         ties AS (SELECT CAST(COALESCE(sum(CAST(tcount AS HUGEINT)
                    * (tcount - 1) * (2 * CAST(tcount AS HUGEINT) + 5)), 0)
                    AS HUGEINT) AS tie_term,
                    CAST(sum(tcount) AS BIGINT) AS n
                  FROM (SELECT x, CAST(count(*) AS BIGINT) AS tcount
                        FROM days GROUP BY x))
         SELECT n AS n_days, s,
           FLOOR(CAST(CASE WHEN s > 0 THEN s - 1 WHEN s < 0 THEN s + 1
               ELSE 0 END AS DOUBLE)
             / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1)
                 * (2 * CAST(n AS HUGEINT) + 5) - tie_term AS DOUBLE) / 18.0)
             * 1e4) / 1e4 AS z4,
           sen_slope_micro
         FROM sv, ties, sen""",
    // Theil replay: same per-row floored ln micro-units (identical
    // exact-integer-cast double args), same single division.
    "q_stats_theil" ->
      """WITH rev AS (SELECT o_custkey,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS v
           FROM orders GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(v) AS BIGINT) AS s FROM rev),
         terms AS (SELECT n, s,
             CAST(v AS HUGEINT)
               * CAST(FLOOR(ln(CAST(CAST(v AS HUGEINT) * n AS DOUBLE)
                 / CAST(s AS DOUBLE)) * 1e6) AS HUGEINT) AS t
           FROM rev, tot)
         SELECT CAST(n AS BIGINT) AS n_customers,
           CAST(CAST(sum(t) AS HUGEINT)
             // (CAST(n AS HUGEINT) * s) AS BIGINT) AS theil_micro
         FROM terms GROUP BY n, s""",
    // OLS replay: same exact HUGEINT moments and centered pieces, same
    // truncating slope/intercept division, same fixed-order r² doubles.
    "q_stats_ols" ->
      """WITH li AS (SELECT l_returnflag AS flag,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           FROM lineitem),
         m AS (SELECT flag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
             CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
           FROM li GROUP BY flag),
         d AS (SELECT flag, n, sx, sy,
             CAST(n AS HUGEINT) * sxx - sx * sx AS dxx,
             CAST(n AS HUGEINT) * sxy - sx * sy AS dxy,
             CAST(n AS HUGEINT) * syy - sy * sy AS dyy
           FROM m),
         s AS (SELECT flag, n, sx, sy, dxx, dxy, dyy,
             CAST((dxy * 1000000) // dxx AS BIGINT) AS slope6 FROM d)
         SELECT flag, n, slope6,
           CAST((sy * 1000000 - CAST(slope6 AS HUGEINT) * sx) // n
             AS BIGINT) AS intercept6,
           FLOOR(CAST(dxy AS DOUBLE) * CAST(dxy AS DOUBLE)
             / (CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)) * 1e4) / 1e4
             AS r2_4
         FROM s ORDER BY flag""",
    // Kruskal–Wallis replay: same distinct-value 2-scaled midranks, same
    // exact rank sums and tie term, same fixed-order H / H_c doubles.
    "q_stats_kruskal" ->
      """WITH vals AS (SELECT
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS cn,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS cr
           FROM lineitem GROUP BY 1),
         r AS (SELECT ca, cn, cr, ca + cn + cr AS t,
             COALESCE(CAST(sum(ca + cn + cr) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS BIGINT), 0) AS cum
           FROM vals),
         agg AS (SELECT CAST(sum(ca) AS BIGINT) AS n1,
             CAST(sum(cn) AS BIGINT) AS n2, CAST(sum(cr) AS BIGINT) AS n3,
             CAST(sum(CAST(ca AS HUGEINT) * (2 * cum + t + 1)) AS BIGINT)
               AS r2a,
             CAST(sum(CAST(cn AS HUGEINT) * (2 * cum + t + 1)) AS BIGINT)
               AS r2b,
             CAST(sum(CAST(cr AS HUGEINT) * (2 * cum + t + 1)) AS BIGINT)
               AS r2c,
             CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties
           FROM r),
         fin AS (SELECT n1, n2, n3, r2a, r2b, r2c, ties,
             n1 + n2 + n3 AS nt,
             CAST(n1 + n2 + n3 AS HUGEINT) * (n1 + n2 + n3)
               * (n1 + n2 + n3) - (n1 + n2 + n3) AS dbig,
             3.0 * (CAST(r2a AS DOUBLE) * CAST(r2a AS DOUBLE)
                 / CAST(n1 AS DOUBLE)
               + CAST(r2b AS DOUBLE) * CAST(r2b AS DOUBLE)
                 / CAST(n2 AS DOUBLE)
               + CAST(r2c AS DOUBLE) * CAST(r2c AS DOUBLE)
                 / CAST(n3 AS DOUBLE))
               / (CAST(n1 + n2 + n3 AS DOUBLE)
                 * (CAST(n1 + n2 + n3 AS DOUBLE) + 1.0))
               - 3.0 * (CAST(n1 + n2 + n3 AS DOUBLE) + 1.0) AS h
           FROM agg)
         SELECT nt AS n, n1, n2, n3, r2a, r2b, r2c,
           FLOOR(h * 1e4) / 1e4 AS h4,
           FLOOR(h * CAST(dbig AS DOUBLE) / CAST(dbig - ties AS DOUBLE)
             * 1e4) / 1e4 AS hc4
         FROM fin""",
    // Welch replay: same exact cent moments from one conditional pass,
    // same truncating micro means, same fixed-order t / df doubles.
    "q_stats_welch" ->
      """WITH c AS (SELECT c_mktsegment AS g,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
           FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
         agg AS (SELECT
             CAST(sum(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN g = 'BUILDING' THEN CAST(v AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN g = 'BUILDING' THEN CAST(v AS HUGEINT) * v
               ELSE 0 END) AS HUGEINT) AS q1,
             CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
             CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN CAST(v AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS s2,
             CAST(sum(CASE WHEN g = 'AUTOMOBILE' THEN CAST(v AS HUGEINT) * v
               ELSE 0 END) AS HUGEINT) AS q2
           FROM c),
         fin AS (SELECT n1, n2, s1, s2,
             CAST(CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS DOUBLE)
               / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * (CAST(n1 AS DOUBLE) - 1.0)) AS vn1,
             CAST(CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS DOUBLE)
               / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 * (CAST(n2 AS DOUBLE) - 1.0)) AS vn2
           FROM agg)
         SELECT n1, n2,
           CAST((s1 * 1000000) // n1 AS BIGINT) AS mean1_micro,
           CAST((s2 * 1000000) // n2 AS BIGINT) AS mean2_micro,
           FLOOR((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
             / sqrt(vn1 + vn2) * 1e4) / 1e4 AS t4,
           FLOOR((vn1 + vn2) * (vn1 + vn2)
             / (vn1 * vn1 / (CAST(n1 AS DOUBLE) - 1.0)
               + vn2 * vn2 / (CAST(n2 AS DOUBLE) - 1.0)) * 1e2) / 1e2
             AS df2
         FROM fin""",
    // PSI replay: same Laplace-smoothed cell counts, same exact integer
    // (a·tb − b·ta) · floor-1e8-ln terms, same truncating division.
    "q_stats_psi" ->
      """WITH cells AS (SELECT event_type || ':' ||
             CAST((epoch_ns(ts) // 86400000000000) % 7 AS VARCHAR) AS cat,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) + 1
               AS BIGINT) AS a,
             CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) + 1
               AS BIGINT) AS b
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
             CAST(sum(b) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS n_cells FROM cells),
         terms AS (SELECT n_cells, ta, tb,
             (CAST(a AS HUGEINT) * tb - CAST(b AS HUGEINT) * ta)
               * CAST(FLOOR(ln(CAST(a AS DOUBLE) * CAST(tb AS DOUBLE)
                   / (CAST(b AS DOUBLE) * CAST(ta AS DOUBLE))) * 1e8)
                 AS HUGEINT) AS term
           FROM cells, tot)
         SELECT n_cells, ta, tb,
           CAST(sum(term) // (CAST(ta AS HUGEINT) * tb) AS BIGINT) AS psi8
         FROM terms GROUP BY n_cells, ta, tb""",
    // ANOVA replay: same exact conditional moments, same fixed-order
    // three-term SSB/SSW doubles, same 2 dp / 4 dp floors.
    "q_stats_anova" ->
      """WITH c AS (SELECT l_returnflag AS g,
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v
           FROM lineitem),
         agg AS (SELECT
             CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN g = 'A' THEN CAST(v AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS s1,
             CAST(sum(CASE WHEN g = 'A' THEN CAST(v AS HUGEINT) * v
               ELSE 0 END) AS HUGEINT) AS q1,
             CAST(sum(CASE WHEN g = 'N' THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN g = 'N' THEN CAST(v AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS s2,
             CAST(sum(CASE WHEN g = 'N' THEN CAST(v AS HUGEINT) * v
               ELSE 0 END) AS HUGEINT) AS q2,
             CAST(sum(CASE WHEN g = 'R' THEN 1 ELSE 0 END) AS BIGINT)
               AS n3,
             CAST(sum(CASE WHEN g = 'R' THEN CAST(v AS HUGEINT)
               ELSE 0 END) AS HUGEINT) AS s3,
             CAST(sum(CASE WHEN g = 'R' THEN CAST(v AS HUGEINT) * v
               ELSE 0 END) AS HUGEINT) AS q3
           FROM c),
         fin AS (SELECT n1, n2, n3,
             CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(n2 AS DOUBLE)
               + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
                 / CAST(n3 AS DOUBLE) AS bet,
             CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
               AS stot,
             CAST(q1 AS DOUBLE) + CAST(q2 AS DOUBLE) + CAST(q3 AS DOUBLE)
               AS qtot,
             CAST(n1 + n2 + n3 AS DOUBLE) AS ntd
           FROM agg)
         SELECT n1 + n2 + n3 AS n, n1, n2, n3,
           FLOOR((bet - stot * stot / ntd) * 1e2) / 1e2 AS ssb2,
           FLOOR((qtot - bet) * 1e2) / 1e2 AS ssw2,
           FLOOR(((bet - stot * stot / ntd) / 2.0)
             / ((qtot - bet) / (ntd - 3.0)) * 1e4) / 1e4 AS f4
         FROM fin""",
    // Brown–Forsythe replay: same distinct-value 2-scaled medians, same
    // exact deviation moments, same fixed-order F surface.
    "q_stats_levene" ->
      """WITH vals AS (SELECT
             CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS v,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END)
               AS BIGINT) AS cn,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS BIGINT) AS cr
           FROM lineitem GROUP BY 1),
         cum AS (SELECT v, ca, cn, cr,
             CAST(sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cuma,
             CAST(sum(cn) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumn,
             CAST(sum(cr) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
               PRECEDING AND CURRENT ROW) AS BIGINT) AS cumr
           FROM vals),
         tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cn) AS BIGINT) AS nb,
             CAST(sum(cr) AS BIGINT) AS nc FROM vals),
         med AS (SELECT
             CAST(min(CASE WHEN cuma >= (na + 1) // 2 THEN v END)
               + min(CASE WHEN cuma >= (na + 2) // 2 THEN v END)
               AS BIGINT) AS meda2,
             CAST(min(CASE WHEN cumn >= (nb + 1) // 2 THEN v END)
               + min(CASE WHEN cumn >= (nb + 2) // 2 THEN v END)
               AS BIGINT) AS medn2,
             CAST(min(CASE WHEN cumr >= (nc + 1) // 2 THEN v END)
               + min(CASE WHEN cumr >= (nc + 2) // 2 THEN v END)
               AS BIGINT) AS medr2
           FROM cum, tot),
         agg AS (SELECT
             CAST(sum(ca) AS BIGINT) AS n1,
             CAST(sum(CAST(ca AS HUGEINT) * abs(2 * v - meda2))
               AS HUGEINT) AS s1,
             CAST(sum(CAST(ca AS HUGEINT) * abs(2 * v - meda2)
               * abs(2 * v - meda2)) AS HUGEINT) AS q1,
             CAST(sum(cn) AS BIGINT) AS n2,
             CAST(sum(CAST(cn AS HUGEINT) * abs(2 * v - medn2))
               AS HUGEINT) AS s2,
             CAST(sum(CAST(cn AS HUGEINT) * abs(2 * v - medn2)
               * abs(2 * v - medn2)) AS HUGEINT) AS q2,
             CAST(sum(cr) AS BIGINT) AS n3,
             CAST(sum(CAST(cr AS HUGEINT) * abs(2 * v - medr2))
               AS HUGEINT) AS s3,
             CAST(sum(CAST(cr AS HUGEINT) * abs(2 * v - medr2)
               * abs(2 * v - medr2)) AS HUGEINT) AS q3
           FROM vals, med),
         fin AS (SELECT n1, n2, n3, s1, s2, s3,
             CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
               + CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                 / CAST(n2 AS DOUBLE)
               + CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
                 / CAST(n3 AS DOUBLE) AS bet,
             CAST(s1 AS DOUBLE) + CAST(s2 AS DOUBLE) + CAST(s3 AS DOUBLE)
               AS stot,
             CAST(q1 AS DOUBLE) + CAST(q2 AS DOUBLE) + CAST(q3 AS DOUBLE)
               AS qtot,
             CAST(n1 + n2 + n3 AS DOUBLE) AS ntd
           FROM agg)
         SELECT n1 + n2 + n3 AS n, n1, n2, n3,
           CAST(s1 AS BIGINT) AS dev2_sum_a,
           CAST(s2 AS BIGINT) AS dev2_sum_n,
           CAST(s3 AS BIGINT) AS dev2_sum_r,
           FLOOR(((bet - stot * stot / ntd) / 2.0)
             / ((qtot - bet) / (ntd - 3.0)) * 1e4) / 1e4 AS f4
         FROM fin""",
    // Cohen's kappa replay: the same gp/qq prefix, the same per-doc join,
    // then the marginal-based chance-agreement arithmetic in lockstep
    // integer form (agree*n - pe_num over n^2 - pe_num, micro-scaled).
    "q_stats_kappa" ->
      (gopherQualityCtes + """,
         j AS (SELECT gp.gp AS gp, qq.quality >= 0.5 AS qp
               FROM gp JOIN qq USING (doc_id)),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN gp THEN 1 ELSE 0 END) AS BIGINT) AS g_pos,
             CAST(sum(CASE WHEN qp THEN 1 ELSE 0 END) AS BIGINT) AS q_pos,
             CAST(sum(CASE WHEN gp = qp THEN 1 ELSE 0 END) AS BIGINT)
               AS agree
           FROM j)
         SELECT n, g_pos, q_pos, agree,
           CAST(agree * 1000000 // n AS BIGINT) AS po_micro,
           CAST((g_pos * q_pos + (n - g_pos) * (n - q_pos)) * 1000000
             // (n * n) AS BIGINT) AS pe_micro,
           CAST(CASE WHEN n * n = g_pos * q_pos + (n - g_pos) * (n - q_pos)
             THEN 0 ELSE (agree * n - (g_pos * q_pos + (n - g_pos)
             * (n - q_pos))) * 1000000 // (n * n - (g_pos * q_pos
             + (n - g_pos) * (n - q_pos))) END AS BIGINT) AS kappa_micro
         FROM a"""),
    // Mahalanobis replay: HUGEINT exact moments/scatter/residuals, the
    // identical fixed-order double assembly, same (d2 desc, orderkey,
    // linenumber) top-20.
    "q_stats_mahalanobis" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber,
             CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT) AS x,
             CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
           FROM lineitem),
         m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
           FROM li)
         SELECT l_orderkey, l_linenumber,
           CAST(x AS BIGINT) AS x_centi, CAST(y AS BIGINT) AS y_centi,
           floor(
             (CAST(n AS DOUBLE) - 1.0) * (
                 CAST(n * syy - sy * sy AS DOUBLE)
                   * CAST(n * x - sx AS DOUBLE) * CAST(n * x - sx AS DOUBLE)
               - 2.0 * CAST(n * sxy - sx * sy AS DOUBLE)
                   * CAST(n * x - sx AS DOUBLE) * CAST(n * y - sy AS DOUBLE)
               + CAST(n * sxx - sx * sx AS DOUBLE)
                   * CAST(n * y - sy AS DOUBLE) * CAST(n * y - sy AS DOUBLE))
             / (CAST(n AS DOUBLE)
                * ((CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE))
                   - CAST(n * sxy - sx * sy AS DOUBLE)
                     * CAST(n * sxy - sx * sy AS DOUBLE)))
             * 10000) / 10000 AS md2_4dp
         FROM li, m
         ORDER BY md2_4dp DESC, l_orderkey, l_linenumber LIMIT 20""",
    // Basket rules replay: distinct (order, brand) membership, the
    // directional same-basket pair join, and the identical nested
    // truncating conf4 / lift4 = conf4·N // n(cons) surfaces.
    "q_mb_assoc_rules" ->
      """WITH ob AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         nb AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
                FROM ob),
         bc AS (SELECT b, CAST(count(*) AS BIGINT) AS bn FROM ob GROUP BY 1),
         pc AS (SELECT x.b AS ant, y.b AS cons,
                  CAST(count(*) AS BIGINT) AS pair_n
                FROM ob x JOIN ob y ON x.ok = y.ok AND x.b <> y.b
                GROUP BY 1, 2
                HAVING count(*) >= 20)
         SELECT ant, cons, pair_n,
           pair_n * 10000 // ba.bn AS conf4,
           (pair_n * 10000 // ba.bn) * n_baskets // bb.bn AS lift4
         FROM pc
           JOIN bc ba ON pc.ant = ba.b
           JOIN bc bb ON pc.cons = bb.b, nb
         ORDER BY lift4 DESC, ant, cons LIMIT 20""",
    // Signed-rank replay: same day pairing, zero-difference drop,
    // 2-scaled mid-ranks over distinct |d|, identical cleared-x4
    // normal-approximation surface.
    "q_stats_signed_rank" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS BIGINT) AS v,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
               END) AS BIGINT) AS p
           FROM events GROUP BY 1),
         dd AS (SELECT abs(v - p) AS ad, v - p > 0 AS pos
                FROM days WHERE v - p <> 0),
         grp AS (SELECT ad, CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
                     AS tp
                 FROM dd GROUP BY 1),
         rk AS (SELECT ad, t, tp,
                  COALESCE(CAST(sum(t) OVER (ORDER BY ad
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS cum
                FROM grp),
         ag AS (SELECT CAST(sum(t) AS BIGINT) AS n,
                  CAST(sum(tp * (2 * cum + t + 1)) AS BIGINT) AS w2
                FROM rk)
         SELECT n, w2 AS w2_plus,
           CAST(floor((2 * w2 - n * (n + 1)) * 10000 /
             sqrt(CAST(2 * n AS DOUBLE) * (n + 1) * (2 * n + 1) /
             CAST(3 AS DOUBLE))) AS BIGINT) AS z4
         FROM ag WHERE n >= 1""",
  )
}
