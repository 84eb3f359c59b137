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

/** Time-series queries.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryTs extends RegistryStats {

  /** Cross-correlation function (CCF) between the daily view and
    * purchase series at lags 0..7 — the lead/lag diagnostic a
    * marketing/ops analyst runs before claiming "views convert to
    * purchases k days later" (Box & Jenkins 1970 ch. 11's sample CCF,
    * on the two series the events table actually carries). Exactness:
    * both series are integer daily counts from ONE events pass; lag
    * pairs come from a self-join of the tiny day-grain aggregate
    * (≤ one row per day — broadcastable at any corpus scale, the same
    * reduce-then-pair shape as seasonality); per-lag Pearson moments
    * are exact DECIMAL(38,0), and the only double surface is the final
    * num/sqrt(dx·dy) division, floored to 4 dp with zero-variance
    * lags degenerating to 0. */
  protected def tsCcf(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .cast(dec).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast(dec).as("y"))
    val a = days.select(col("day").as("a_day"), col("x"))
    val b = days.select(col("day").as("b_day"), col("y"))
    a.join(broadcast(b),
        col("b_day") - col("a_day") >= 0 && col("b_day") - col("a_day") <= 7)
      .select((col("b_day") - col("a_day")).as("lag"), col("x"), col("y"))
      .groupBy("lag")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("y") * col("y")).cast(dec)).as("syy"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"))
      .select(col("lag").cast("long").as("lag"),
        col("n").cast("long").as("n_days"),
        expr("""CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
          THEN CAST(0.0 AS DOUBLE)
          ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
              * CAST(n * syy - sy * sy AS DOUBLE)) * 10000) / 10000
          END""").as("r4"))
      .orderBy("lag")
  }

  /** Partial autocorrelation function at lags 1..7 via Durbin–Levinson
    * (Box & Jenkins 1970 §3.2; Durbin 1960) — the AR-order diagnostic
    * [[statsAutocorr]] cannot give: ACF at lag k mixes the direct
    * effect with everything propagated through lags < k, PACF isolates
    * it (the "does yesterday STILL matter given the week?" question).
    * Determinism: the day-grain series is collected ORDERED and every
    * double op — mean, the ascending-t autocovariance folds, the DL
    * recursion — is mirrored op-for-op by the oracle's recursive CTE
    * carrying the φ row as a LIST<DOUBLE> (prototyped standalone: CTE
    * output == an independent Python fold on a 15-value series).
    * Guards match: series shorter than 8 days or with zero variance
    * yield no rows. Scale shape: one events pass to the day grain;
    * the collected series is bounded by the CALENDAR (≤ a few
    * thousand doubles at any corpus size), so driver-side DL is the
    * [[statsCorr]] moment-collect discipline, not a data collect. */
  protected def tsPacf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val xs: Array[Long] = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .orderBy("day").select("x").collect().map(_.getLong(0))
    val n = xs.length
    val empty = Seq.empty[(Long, Double)].toDF("lag", "pacf4")
    if (n < 8) return empty
    val s = xs.foldLeft(0L)(_ + _)
    val mean = s.toDouble / n.toDouble
    def gamma(k: Int): Double = {
      var acc = 0.0
      var i = 0
      while (i < n - k) {
        acc = acc + (xs(i) - mean) * (xs(i + k) - mean)
        i += 1
      }
      acc / n.toDouble
    }
    val g = (0 to 7).map(gamma).toArray
    if (g(0) == 0.0) return empty
    val pacf = new Array[Double](8)
    pacf(1) = g(1) / g(0)
    var phi = Array(g(1) / g(0))
    var v = g(0) * (1.0 - (g(1) / g(0)) * (g(1) / g(0)))
    for (k <- 1 until 7) {
      var acc = 0.0
      for (j2 <- 1 to k) acc = acc + phi(j2 - 1) * g(k + 1 - j2)
      val pkk = (g(k + 1) - acc) / v
      val next = new Array[Double](k + 1)
      for (j <- 1 to k) next(j - 1) = phi(j - 1) - pkk * phi(k - j)
      next(k) = pkk
      v = v * (1.0 - pkk * pkk)
      phi = next
      pacf(k + 1) = pkk
    }
    (1 to 7).map(k => (k.toLong, math.floor(pacf(k) * 10000) / 10000))
      .toDF("lag", "pacf4")
  }

  /** Day-of-week seasonality of event volume — the variance-explained
    * decomposition (η² = SSB/SST, one-way ANOVA over weekday groups)
    * that decides whether a forecast/anomaly baseline needs a weekly
    * profile or a flat trend. Exactness: daily counts are integers, the
    * day-of-week is pure integer epoch arithmetic ((day+4) mod 7 — no
    * timezone/date functions to drift between engines), and both sums
    * of squares clear to integer micro-units via per-group
    * floor(S_g²·10⁶ div c_g) BEFORE differencing — one double division
    * at the surface. Per-dow means are exact integer divisions. */
  protected def tsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val g = days.groupBy("dow").agg(count(lit(1)).as("c"),
        sum(col("x")).as("s"),
        sum(col("x").cast(dec) * col("x")).as("q"))
      .withColumn("gb", expr(
        "(CAST(s AS DECIMAL(38,0)) * s * 1000000) div c"))
    val tot = g.agg(sum(col("c")).as("n"), sum(col("s")).as("st"),
        sum(col("q")).as("qt"), sum(col("gb").cast(dec)).as("sgb"))
      .select(col("n"), col("st"), col("qt"), col("sgb"),
        expr("(CAST(st AS DECIMAL(38,0)) * st * 1000000) div n").as("cf"))
      .select(col("n").cast("long").as("n_days"),
        (floor((col("sgb") - col("cf")).cast("double")
          / (col("qt") * 1000000 - col("cf")).cast("double")
          * 1e6) / 1e6).as("eta6"))
    g.select(col("dow").cast("long").as("dow"), col("c").as("n_days_dow"),
        expr("(CAST(s AS DECIMAL(38,0)) * 1000000) div c").as("mean_micro"))
      .crossJoin(broadcast(tot))
      .orderBy("dow")
  }

  /** Exponential smoothing (EWMA, α = 1/4) of the per-user minute-bin
    * value series — the trailing-baseline a monitoring pipeline keeps
    * per key ("is the current bin off-trend"), companion to
    * [[tsResample]]. Exactness: bin values are exact integer 10⁴ units;
    * the recurrence s_t = (v_t + 3·s_{t−1}) div 4 runs as ONE fold
    * inside a higher-order function on the SORTED per-user series
    * (Spark `aggregate(slice(...), first, ...)` ≡ DuckDB `list_reduce`)
    * — all operands positive, so truncating div matches // step for
    * step. Scale shape: one groupBy to bins, one groupBy to per-key
    * series; the fold is row-local over each key's bounded series — the
    * state never crosses an exchange (what mapGroupsWithState does in
    * the streaming surface, done here in batch). */
  protected def tsEwma(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events").filter(col("user_id") < 5)
      .select(col("user_id"), expr("ts div 60000000000").as("bin"),
        floor(col("value") * 10000 + 0.5).cast("long").as("u"))
    e.groupBy("user_id", "bin").agg(sum(col("u")).as("bu"))
      .groupBy("user_id").agg(
        count(lit(1)).as("n_bins"),
        expr("transform(sort_array(collect_list(struct(bin, bu))), " +
          "p -> p.bu)").as("vals"))
      .select(col("user_id"), col("n_bins"),
        expr("element_at(vals, 1)").as("first_units"),
        expr("element_at(vals, -1)").as("last_units"),
        expr("aggregate(slice(vals, 2, size(vals) - 1), " +
          "element_at(vals, 1), (acc, x) -> (x + 3 * acc) div 4)")
          .as("ewma_units"))
      .orderBy("user_id")
  }

  /** Time-series gap-fill + resample: events (bounded user slice) bucketed to 1-minute bins per user, the per-user span densified (every minute present), empty bins
    * forward-filled with the last seen value. Bin index uses exact integer
    * floor-division (`div` / DuckDB `//`) — double division of nanosecond
    * epochs can misbin boundary timestamps. */
  protected def tsResample(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("bin_minute")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val e = t(spark, dir, "events").filter(col("user_id") < 5)
      .select(col("user_id"), expr("ts div 60000000000").as("bin_minute"),
        col("value"))
    val binned = e.groupBy("user_id", "bin_minute")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(20, 4))).cast("double").as("bin_value"))
    val grid = binned.groupBy("user_id")
      .agg(min("bin_minute").as("lo"), max("bin_minute").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"))).as("bin_minute"))
    grid.join(binned, Seq("user_id", "bin_minute"), "left")
      .select(col("user_id"), col("bin_minute"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("bin_value"), ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("user_id", "bin_minute")
  }

  /** CUSUM changepoint probe on daily volume (Page 1954 — "did the level
    * shift, and when?"): the drift detector a monitoring pipeline runs
    * before trusting week-over-week comparisons. Exactness: the
    * cumulative statistic is the INTEGER S_i = Σ_{j≤i} (n·x_j − T)
    * (each term scaled by n so the mean subtraction never leaves the
    * integers; S_n ≡ 0 by construction), the changepoint is argmax |S|
    * with the earliest day breaking ties, and the before/after level
    * means are integer micro-unit divisions. All windows run over the
    * bounded daily relation. */
  protected def tsChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val tot = days.agg(count(lit(1)).as("n"), sum(col("x")).as("tt"))
    val cus = days.crossJoin(broadcast(tot))
      .withColumn("s", sum(col("x") * col("n") - col("tt")).over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)))
    val cp = cus.orderBy(abs(col("s")).desc, col("day")).limit(1)
      .select(col("day").as("cp_day"), abs(col("s")).as("s_abs"))
    days.crossJoin(broadcast(cp))
      .groupBy("cp_day", "s_abs")
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("day") <= col("cp_day"), col("x"))).as("sb"),
        sum(when(col("day") <= col("cp_day"), 1L).otherwise(0L)).as("nb"),
        sum(when(col("day") > col("cp_day"), col("x"))).as("sa"),
        sum(when(col("day") > col("cp_day"), 1L).otherwise(0L)).as("na"))
      .select(col("n_days"), col("cp_day"), col("s_abs"),
        expr("sb * 1000000 div nb").as("mean_before_micro"),
        expr("CASE WHEN na = 0 THEN NULL ELSE sa * 1000000 div na END")
          .as("mean_after_micro"))
  }

  /** Hampel filter on the daily volume series (Hampel 1974; Pearson
    * 2002 on its use as the standard despiking filter): a day is an
    * outlier when it sits more than 3 rolling MADs from the rolling
    * ±3-day median — the robust alternative to z-score despiking that a
    * volume monitor runs before trend tests like [[statsMannKendall]].
    * FULLY integer: counts are integers, a 7-slot window has an odd
    * length so median and MAD are exact integers (edge days with
    * partial windows are excluded — no ½ midpoints), the flag is the
    * integer compare |x−med| > 3·MAD (MAD = 0 degenerates to "any
    * deviation flags", the documented Hampel edge). The ±3-row window
    * runs over the bounded daily relation, never the corpus. */
  protected def tsHampel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    days.withColumn("lst", collect_list(col("x")).over(w))
      .filter(size(col("lst")) === 7)
      .withColumn("med", expr("element_at(array_sort(lst), 4)"))
      .withColumn("mad",
        expr("element_at(array_sort(transform(lst, e -> abs(e - med))), 4)"))
      .select(col("day"), col("x"), col("med"), col("mad"),
        (abs(col("x") - col("med")) > lit(3L) * col("mad")).as("is_outlier"))
      .orderBy("day")
  }

  /** Holt linear (double) exponential smoothing of daily volume
    * (Holt 1957/2004 reprint) with α = β = 1/4 — the trend-aware
    * successor of [[tsEwma]]'s level-only baseline: keeps (level,
    * trend) state so a steadily growing series forecasts ahead instead
    * of lagging. Exactness: daily counts in exact 10⁴ units; the
    * coupled recurrence l' = (x + 3(l+b)) div 4, b' = (l'−l+3b) div 4
    * runs as ONE struct-accumulator fold over the sorted bounded daily
    * series (initialized l₂=x₂, b₂=x₂−x₁) — all integer, and div ≡ //
    * (both truncate) keeps a negative trend in lockstep. The ORACLE
    * replays the recurrence with a recursive CTE rather than
    * list_reduce: DuckDB 1.0.0's list_reduce mis-accumulates STRUCT
    * accumulators (measured: two chained steps drop the trend field —
    * each single step is correct), so the replay mechanism differs
    * while the arithmetic stays identical. */
  protected def tsHolt(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((count(lit(1)) * 10000L).as("x"))
    days.agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, x))), " +
          "p -> p.x)").as("vals"))
      .filter(col("n_days") >= 2)
      .withColumn("st", expr(
        "aggregate(slice(vals, 3, greatest(size(vals) - 2, 0)), " +
          "named_struct('l', element_at(vals, 2), " +
          "'b', element_at(vals, 2) - element_at(vals, 1)), " +
          "(acc, x) -> named_struct(" +
          "'l', (x + 3 * (acc.l + acc.b)) div 4, " +
          "'b', ((x + 3 * (acc.l + acc.b)) div 4 - acc.l + 3 * acc.b) " +
          "div 4))"))
      .select(col("n_days"), col("st.l").as("level_units"),
        col("st.b").as("trend_units"),
        (col("st.l") + col("st.b")).as("forecast_units"))
  }

  /** In-sample one-step-ahead backtest of the [[tsHolt]] smoother —
    * sMAPE (Makridakis 1993's symmetric percentage error) and MASE
    * (Hyndman & Koehler 2006's scale-free error against the naive
    * x_{t-1} forecast): the engine measuring its OWN forecaster, the
    * time-series member of the self-eval family (ANN recall, langid
    * confusion, purity, McNemar, calibration). At each step t ≥ 3 the
    * forecast is l+b BEFORE the Holt update sees x_t, so errors are
    * honest one-step-ahead. FULLY integer: e = |x − (l+b)| in 10⁴
    * units, per-step smape₄ = 2e·10⁴ div (|x|+|l+b|) (x > 0 always —
    * day rows exist only with ≥1 event — so the denominator never
    * vanishes; Long-safe to ~4·10⁸ events/day), reported smape₄ is
    * the truncating mean, mase₄ = Σe·10⁴ div Σ|x_t − x_{t-1}| over
    * the same window (0 on a constant series). ONE struct fold over
    * the sorted bounded daily series; oracle = the [[tsHolt]]
    * recursive-CTE mechanism with the (sae, ssm) state carried
    * alongside (l, b). */
  protected def tsBacktest(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((count(lit(1)) * 10000L).as("x"))
    days.agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, x))), " +
          "p -> p.x)").as("vals"))
      .filter(col("n_days") >= 3)
      .withColumn("st", expr(
        "aggregate(slice(vals, 3, size(vals) - 2), " +
          "named_struct('l', element_at(vals, 2), " +
          "'b', element_at(vals, 2) - element_at(vals, 1), " +
          "'sae', CAST(0 AS BIGINT), 'ssm', CAST(0 AS BIGINT)), " +
          "(acc, x) -> named_struct(" +
          "'l', (x + 3 * (acc.l + acc.b)) div 4, " +
          "'b', ((x + 3 * (acc.l + acc.b)) div 4 - acc.l + 3 * acc.b) " +
          "div 4, " +
          "'sae', acc.sae + abs(x - acc.l - acc.b), " +
          "'ssm', acc.ssm + 2 * abs(x - acc.l - acc.b) * 10000 " +
          "div (abs(x) + abs(acc.l + acc.b))))"))
      .withColumn("naive", expr(
        "aggregate(sequence(3, CAST(size(vals) AS INT)), " +
          "CAST(0 AS BIGINT), " +
          "(a, i) -> a + abs(element_at(vals, i) - element_at(vals, i - 1)))"))
      .select(col("n_days"), (col("n_days") - 2).as("n_eval"),
        col("st.sae").as("sae_units"),
        expr("st.ssm div (n_days - 2)").as("smape4"),
        expr("CASE WHEN naive = 0 THEN 0 " +
          "ELSE st.sae * 10000 div naive END").as("mase4"))
  }

  /** Split-conformal prediction interval for the [[tsHolt]] forecaster
    * (Vovk et al. 2005; Lei et al. 2018's split-conformal recipe) with
    * honest held-out coverage — the uncertainty member of the
    * self-eval family: [[tsBacktest]] scores point accuracy, this
    * query asks whether ±q̂ covers the stated 90%. The one-step
    * |residual| sequence (PRE-update forecasts, the backtest
    * discipline) splits chronologically — first ⌊2m/3⌋ steps
    * calibrate, the rest test; q̂ is the k-th smallest calibration
    * residual with k = min(⌈0.9·(c+1)⌉, c) (the finite-sample
    * conformal rank), and coverage₄ = |{test : r ≤ q̂}|·10⁴ div
    * n_test. FULLY integer over the bounded daily series — one struct
    * fold carrying (l, b, residual list), array_sort + element_at for
    * the order statistic (tie values make rank-k deterministic);
    * oracle = the recursive-CTE replay with a rank window. */
  protected def tsConformal(spark: SparkSession, dir: String): DataFrame = {
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((count(lit(1)) * 10000L).as("x"))
    days.agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, x))), " +
          "p -> p.x)").as("vals"))
      .filter(col("n_days") >= 4)
      .withColumn("st", expr(
        "aggregate(slice(vals, 3, size(vals) - 2), " +
          "named_struct('l', element_at(vals, 2), " +
          "'b', element_at(vals, 2) - element_at(vals, 1), " +
          "'rs', CAST(array() AS ARRAY<BIGINT>)), " +
          "(acc, x) -> named_struct(" +
          "'l', (x + 3 * (acc.l + acc.b)) div 4, " +
          "'b', ((x + 3 * (acc.l + acc.b)) div 4 - acc.l + 3 * acc.b) " +
          "div 4, " +
          "'rs', concat(acc.rs, array(abs(x - acc.l - acc.b)))))"))
      .withColumn("m", expr("CAST(size(st.rs) AS BIGINT)"))
      .withColumn("c", expr("2 * m div 3"))
      .withColumn("k", expr("least((9 * c + 18) div 10, c)"))
      .withColumn("qhat", expr(
        "element_at(array_sort(slice(st.rs, 1, CAST(c AS INT))), " +
          "CAST(k AS INT))"))
      .select(col("n_days"), col("c").as("n_cal"),
        (col("m") - col("c")).as("n_test"),
        col("qhat").as("qhat_units"),
        expr("CAST(size(filter(slice(st.rs, CAST(c + 1 AS INT), " +
          "CAST(m - c AS INT)), r -> r <= qhat)) AS BIGINT) " +
          "* 10000 div (m - c)").as("coverage4"))
  }

  /** Holt–Winters additive seasonal smoothing of daily volume (Winters
    * 1960; α = β = γ = 1/4, period 7) — the weekly-seasonality-aware
    * completion of the [[tsEwma]] → [[tsHolt]] ladder: level, trend,
    * AND a 7-slot day-of-week profile maintained together, so the
    * one-step forecast stops mistaking Sunday dips for trend breaks.
    * Exactness: 10⁴-unit integer state throughout — init l₀ = (Σ first
    * week) div 7, b₀ = 0, sᵢ = xᵢ − l₀; each step updates
    * l' = (x − s_pos + 3(l+b)) div 4, b' = (l'−l+3b) div 4,
    * s'_pos = (x − l' + 3·s_pos) div 4 inside ONE struct{l, b,
    * array}-accumulator fold over the index-tagged tail (div ≡ //
    * truncation carries the negative seasonal offsets in lockstep).
    * The oracle replays with a recursive CTE carrying the seasonal
    * LIST column (the [[tsHolt]] mechanism — DuckDB 1.0.0 list_reduce
    * cannot hold struct state). Series shorter than 8 days yield no
    * row on either engine. */
  protected def tsHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val l2 = "(e.v - element_at(acc.se, CAST((e.t - 1) % 7 + 1 AS INT))" +
      " + 3 * (acc.l + acc.b)) div 4"
    val days = t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((count(lit(1)) * 10000L).as("x"))
    days.agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, x))), " +
          "p -> p.x)").as("vals"))
      .filter(col("n_days") >= 8)
      .withColumn("l0",
        expr("aggregate(slice(vals, 1, 7), CAST(0 AS BIGINT), " +
          "(a, x) -> a + x) div 7"))
      .withColumn("st", expr(
        "aggregate(" +
          "transform(slice(vals, 8, greatest(size(vals) - 7, 0)), " +
          "(v, k) -> named_struct('v', v, 't', CAST(k AS BIGINT) + 8)), " +
          "named_struct('l', l0, 'b', CAST(0 AS BIGINT), " +
          "'se', transform(slice(vals, 1, 7), x -> x - l0)), " +
          "(acc, e) -> named_struct(" +
          s"'l', $l2, " +
          s"'b', ($l2 - acc.l + 3 * acc.b) div 4, " +
          "'se', transform(acc.se, (s0, j) -> " +
          "IF(CAST(j AS BIGINT) + 1 = (e.t - 1) % 7 + 1, " +
          s"(e.v - ($l2) + 3 * s0) div 4, s0)))" +
          ")"))
      .select(col("n_days"), col("st.l").as("level_units"),
        col("st.b").as("trend_units"),
        expr("element_at(st.se, CAST(n_days % 7 + 1 AS INT))")
          .as("next_seasonal_units"),
        (col("st.l") + col("st.b") +
          expr("element_at(st.se, CAST(n_days % 7 + 1 AS INT))"))
          .as("forecast_units"),
        expr("st.se[0]").as("seas1"), expr("st.se[1]").as("seas2"),
        expr("st.se[2]").as("seas3"), expr("st.se[3]").as("seas4"),
        expr("st.se[4]").as("seas5"), expr("st.se[5]").as("seas6"),
        expr("st.se[6]").as("seas7"))
  }

  /** Croston's method for intermittent demand (Croston 1972) — the
    * forecasting family member the dense-series ops ([[tsEwma]],
    * [[tsHolt]]) mishandle by construction: per part brand, daily
    * shipment demand is mostly zeros, so Croston smooths the nonzero
    * demand SIZES and the inter-demand INTERVALS separately (α = 1/5,
    * truncating updates with the sign split both engines replay) and
    * forecasts size/interval. Bounded state by contract: only the LAST
    * 64 demand points per brand enter the fold (WindowGroupLimit prunes
    * pre-shuffle; forecast warm-up never needs the full history), so
    * the per-group row is O(64) at any corpus size. The fold is one
    * row-local `aggregate` over the sorted point array; the oracle
    * replays it via the DTW list_reduce accumulator trick. */
  protected def tsCroston(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val demands = t(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("datediff(l_shipdate, DATE'1970-01-01')").cast("long")
          .as("day"),
        floor(col("l_quantity") + 0.5).cast("long").as("q"))
      .join(t(spark, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        Seq("l_partkey"))
      .groupBy("p_brand", "day").agg(sum(col("q")).as("x"))
    val last64 = demands
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_brand").orderBy(col("day").desc)))
      .filter(col("rn") <= 64)
    // tdiv = truncate-toward-zero division by 5 (Spark div truncates,
    // DuckDB // floors — they agree only through this sign split).
    def tdiv(a: String): String =
      s"CASE WHEN ($a) < 0 THEN -((-($a)) div 5) ELSE ($a) div 5 END"
    val fold =
      s"""aggregate(slice(arr, 2, size(arr) - 1),
          named_struct('z', arr[0].x, 'p', CAST(1 AS BIGINT),
            'pd', arr[0].day),
          (acc, e) -> named_struct(
            'z', acc.z + ${tdiv("e.x - acc.z")},
            'p', acc.p + ${tdiv("(e.day - acc.pd) - acc.p")},
            'pd', e.day))"""
    last64.groupBy("p_brand")
      .agg(sort_array(collect_list(struct(col("day"), col("x"))))
        .as("arr"))
      .select(col("p_brand"), size(col("arr")).cast("long").as("n_points"),
        expr(s"$fold.z").as("z_size"),
        expr(s"$fold.p").as("p_interval"),
        expr(s"($fold.z) * 10000 div ($fold.p)").as("forecast4"))
      .orderBy("p_brand")
  }

  /** Dynamic time warping with a Sakoe–Chiba band (Sakoe & Chiba 1978,
    * |i−j| ≤ 5) between every pair of event-type daily-activity
    * profiles — the shape-similarity measure that survives phase shifts
    * where [[tsCcf]]'s fixed-lag correlation does not. Profiles fold to
    * the 31-phase day grid (data-INDEPENDENT length, the statsSignBh
    * bounding trick), so the DP is a fixed 961-cell fold: ONE
    * row-local `aggregate` per pair whose accumulator is the dp array
    * in cell order (banded cells pin to a 10¹⁵ sentinel; the
    * min-of-three recurrence never adds onto the sentinel, so costs
    * stay exact Longs). The DuckDB oracle replays the identical fold
    * via list_reduce with a list accumulator — bit-for-bit, no floats
    * anywhere. Scale shape: one phase aggregate is the only
    * corpus-sized pass; the pair relation is |types|²-bounded and the
    * DP is row-local compute (at 100 TB this parallelizes per pair
    * with zero extra shuffle). `l1` is the no-warp diagonal cost, so
    * gain_bp = how much alignment the band buys, and dtw ≤ l1 is a
    * per-row invariant the oracle hash enforces. */
  protected def tsDtw(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val L = 31; val W = 5; val INF = 1000000000000000L
    val cnt = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"(ts div $dayNs) % $L").as("ph"))
      .agg(count(lit(1)).as("c"))
    val vecs = cnt.groupBy("event_type")
      .agg(map_from_entries(collect_list(struct(col("ph"), col("c"))))
        .as("m"))
      .select(col("event_type"),
        expr(s"transform(sequence(0, ${L - 1}), i -> " +
          "coalesce(m[CAST(i AS BIGINT)], CAST(0 AS BIGINT)))").as("v"))
    val pairs = vecs.as("a")
      .join(broadcast(vecs.as("b")),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        col("a.v").as("av"), col("b.v").as("bv"))
    val inf = s"CAST($INF AS BIGINT)"
    val least3 =
      s"""least(
          CASE WHEN t % $L > 0 THEN element_at(acc, t) ELSE $inf END,
          CASE WHEN t div $L > 0 THEN element_at(acc, t - ${L - 1})
               ELSE $inf END,
          CASE WHEN t div $L > 0 AND t % $L > 0
               THEN element_at(acc, t - $L) ELSE $inf END)"""
    val dpExpr =
      s"""element_at(aggregate(sequence(1, ${L * L - 1}),
          array(CAST(abs(element_at(av, 1) - element_at(bv, 1)) AS BIGINT)),
          (acc, t) -> concat(acc, array(
            CASE WHEN abs(t div $L - t % $L) > $W THEN $inf
            ELSE CASE WHEN $least3 >= $inf THEN $inf
            ELSE abs(element_at(av, CAST(t div $L AS INT) + 1)
                   - element_at(bv, t % $L + 1)) + $least3
            END END))), ${L * L})"""
    pairs
      .select(col("type_a"), col("type_b"),
        expr(dpExpr).as("dtw"),
        expr(s"aggregate(sequence(0, ${L - 1}), CAST(0 AS BIGINT), " +
          "(s, i) -> s + abs(element_at(av, i + 1) - element_at(bv, i + 1)))")
          .as("l1"))
      .withColumn("gain_bp",
        expr("CASE WHEN l1 = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE (l1 - dtw) * 10000 div l1 END"))
      .orderBy("type_a", "type_b")
  }

  /** Permutation entropy (Bandt & Pompe 2002 — the complexity measure
    * of a series' ORDINAL structure: a monotone ramp scores 0, noise
    * scores ~1, regardless of amplitude or marginal distribution; the
    * regularity screen that catches what variance-based monitors like
    * [[RegistryStats]]'s XmR cannot): per event type, embed the daily
    * count series at order m = 3 over consecutive OBSERVED days, encode
    * each triple's ordinal pattern by three strict pairwise
    * comparisons (later-equal ranks after earlier — the Bandt–Pompe
    * index tie rule; the 3-bit code hits exactly the 6 legal
    * patterns), then Shannon entropy over pattern frequencies via the
    * [[RegistryStats]] entropy identity (H·n = ln(n)·n − Σ c·ln c on
    * the 10⁻⁶ grid, one division), normalized by ln 3! = 1.791759 to
    * npe_bp. Scale shape: the corpus reduces once to (type, day) bins;
    * lead windows and the pattern groupBy run on that bounded
    * relation. */
  protected def tsPermEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val dec = DecimalType(38, 0)
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val tri = daily
      .withColumn("x1", lead(col("x"), 1).over(w))
      .withColumn("x2", lead(col("x"), 2).over(w))
      .filter(col("x2").isNotNull)
      .withColumn("pat",
        when(col("x1") < col("x"), 4L).otherwise(0L)
          + when(col("x2") < col("x"), 2L).otherwise(0L)
          + when(col("x2") < col("x1"), 1L).otherwise(0L))
    tri.groupBy("event_type", "pat").agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(sum(col("cnt")).as("n"), count(lit(1)).as("n_patterns"),
        sum(floor(log(col("cnt").cast("double")) * 1e6).cast(dec)
          * col("cnt")).as("se"))
      .select(col("event_type"), col("n").cast("long").as("n_triples"),
        col("n_patterns"),
        expr("(CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) AS DECIMAL(38,0))" +
          " * n - se) div n").as("h_micro"),
        expr("CAST((CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) " +
          "AS DECIMAL(38,0)) * n - se) div n AS BIGINT) " +
          "* 10000 div 1791759").as("npe_bp"))
      .orderBy("event_type")
  }

  /** Symbolic Aggregate approXimation + motif mining (Lin, Keogh,
    * Lonardi & Chiu 2003, "A symbolic representation of time series"):
    * each event type's daily value series reduces to PAA segments
    * (length-4 piecewise sums) discretized against the series' OWN
    * rank-based quartiles into a 4-letter alphabet, and the most
    * frequent length-3 symbol motif surfaces per series — the
    * dimensionality-reduction + pattern-mining pass run before any
    * subsequence search at scale. Exactness: breakpoints are exact
    * order statistics (the x at ranks ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉ under the
    * deterministic (x, day) order — empirical quartiles, not the
    * Gaussian table, so no normalization doubles anywhere), and each
    * PAA-vs-breakpoint comparison clears to the integer S > q·L — the
    * whole pipeline is integer/character arithmetic both engines
    * replay bit for bit. Scale shape: the corpus reduces ONCE to
    * (type, day) bins; ranking, segmenting, and motif windows all run
    * over day-grain (≤ n-days) or segment-grain relations partitioned
    * by event_type. */
  protected def tsSax(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"))
    val idx = daily
      .withColumn("i", row_number()
        .over(Window.partitionBy("event_type").orderBy("day")).cast("long"))
      .withColumn("r", row_number()
        .over(Window.partitionBy("event_type").orderBy(col("x"), col("day")))
        .cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy("event_type")).cast("long"))
    val q = idx.groupBy("event_type").agg(
      max(when(col("r") === expr("(n + 3) div 4"), col("x"))).as("q1"),
      max(when(col("r") === expr("(n + 1) div 2"), col("x"))).as("q2"),
      max(when(col("r") === expr("(3 * n + 3) div 4"), col("x"))).as("q3"),
      max(col("n")).as("n_days"))
    val sym = idx.withColumn("seg", expr("(i - 1) div 4"))
      .groupBy("event_type", "seg")
      .agg(sum(col("x")).as("s"), count(lit(1)).as("l"))
      .join(broadcast(q), "event_type")
      .select(col("event_type"), col("seg"), col("n_days"),
        expr("""chr(97 + (CASE WHEN s > q1 * l THEN 1 ELSE 0 END)
          + (CASE WHEN s > q2 * l THEN 1 ELSE 0 END)
          + (CASE WHEN s > q3 * l THEN 1 ELSE 0 END))""").as("sym"))
    val word = sym.groupBy("event_type")
      .agg(max(col("n_days")).as("n_days"),
        count(lit(1)).as("n_segments"),
        array_join(transform(
          array_sort(collect_list(struct(col("seg"), col("sym")))),
          x => x.getField("sym")), "").as("sax_word"))
    val wSeg = Window.partitionBy("event_type").orderBy("seg")
    val motif = sym
      .withColumn("m", concat(col("sym"), lead(col("sym"), 1).over(wSeg),
        lead(col("sym"), 2).over(wSeg)))
      .filter(col("m").isNotNull)
      .groupBy("event_type", "m").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type")
        .orderBy(col("c").desc, col("m"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("m").as("top_motif"),
        col("c").as("motif_count"))
    word.join(motif, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"), col("n_segments"),
        col("sax_word"), col("top_motif"), col("motif_count"))
      .orderBy("event_type")
  }

  /** Classical seasonal decomposition by moving averages (Macaulay
    * 1931; the `decompose()` of every stats package, and the
    * fixed-window ancestor of STL, Cleveland et al. 1990): per event
    * type, the daily count series splits into trend (centered 7-day
    * moving average over consecutive OBSERVED days, defined only where
    * the full window exists), seasonal (per-day-of-week mean of the
    * detrended series), and remainder. Exactness: trend is the integer
    * (Σx)·10⁶ div 7 on non-negative counts; the seasonal mean is the
    * ONE signed division (detrended values go negative below trend) so
    * it gets the truncate-vs-floor sign split both engines agree on;
    * remainder health is reported as mean ABSOLUTE deviation — no
    * squares, so nothing approaches the 64-bit cliff even at hot-key
    * sf1 magnitudes. Scale shape: the corpus reduces once to
    * (type, day) bins; the ±3-row trend window, the dow groupBy, and
    * the MAD aggregate all run on that bounded day-grain relation
    * partitioned by event_type. */
  protected def tsDecompose(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("dow", expr("(day + 4) % 7"))
    val w7 = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-3, 3)
    val tr = daily
      .withColumn("s7", sum(col("x")).over(w7))
      .withColumn("c7", count(lit(1)).over(w7))
      .withColumn("n_days",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("c7") === 7)
      .withColumn("trend_micro", expr("s7 * 1000000 div 7"))
      .withColumn("d", expr("x * 1000000 - trend_micro"))
    val seas = tr.groupBy("event_type", "dow")
      .agg(count(lit(1)).as("n_days_dow"), sum(col("d")).as("sd"),
        max(col("n_days")).as("n_days"))
      .withColumn("seasonal_micro", expr(
        "CASE WHEN sd < 0 THEN -((-sd) div n_days_dow) " +
          "ELSE sd div n_days_dow END"))
    val rem = tr
      .join(seas.select(col("event_type"), col("dow"),
        col("seasonal_micro").as("sm")), Seq("event_type", "dow"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_trend_days"),
        sum(abs(col("d") - col("sm"))).as("sabs"))
      .select(col("event_type"), col("n_trend_days"),
        expr("sabs div n_trend_days").as("rem_mad_micro"))
    seas
      .join(rem, Seq("event_type"))
      .select(col("event_type"), col("dow").cast("long").as("dow"),
        col("n_days_dow"), col("seasonal_micro"),
        col("n_days").cast("long").as("n_days"), col("n_trend_days"),
        col("rem_mad_micro"))
      .orderBy("event_type", "dow")
  }

  /** ⌊2¹⁴·2cos(2π/p) + ½⌋ — the one fixed-point constant a Goertzel
    * recursion at period p needs, computed once and emitted into BOTH
    * engines (the ndcgW / DCT-basis shared-literal discipline). */
  private def goertzelC(period: Int): Long =
    math.floor(16384.0 * 2.0 * math.cos(2 * math.Pi / period) + 0.5).toLong

  /** The fixed-point resonator feedback term ⌊C·s / 2¹⁴⌋ sign-split
    * (truncate-toward-zero on both engines — s goes negative every
    * half-cycle), emitted once for Spark HOF lambdas and the DuckDB
    * recursive CTE. */
  private def goertzelFx(c: Long, s: String, spark: Boolean): String = {
    val div = if (spark) "div" else "//"
    s"(CASE WHEN $s >= 0 THEN ($c * $s) $div 16384 " +
      s"ELSE -(($c * -($s)) $div 16384) END)"
  }

  /** Single-bin spectral power via the Goertzel algorithm (Goertzel
    * 1958) at the two cycle lengths an ops calendar cares about —
    * period 7 (the weekly rhythm) and period 5 (the workweek) — over
    * the daily event-count series: the frequency-domain companion to
    * [[tsSeasonality]]'s time-domain day-of-week means. The resonator
    * s_t = x_t + ⌊C·s_{t−1}/2¹⁴⌋ − s_{t−2} runs as ONE integer struct
    * fold over the sorted bounded daily series (both periods share the
    * fold), and the final power |X|² = s₁² + s₂² − ⌊C·s₁/2¹⁴⌋·s₂ clears
    * through DECIMAL(38,0)/HUGEINT, clamps the truncation-noise
    * negatives at zero (the form is PSD exactly; only fixed-point
    * noise can dip below), and reports in 10⁶-unit steps (Long-safe to
    * ~10¹¹ events/day). The oracle replays the recursion with the
    * [[tsHolt]] recursive-CTE mechanism, both periods in one chain.
    * Scale shape: one corpus pass to the day grain; the fold and the
    * 2-row fan-out are calendar-bounded. */
  protected def tsGoertzel(spark: SparkSession, dir: String): DataFrame = {
    val c7 = goertzelC(7); val c5 = goertzelC(5)
    def fold(c: Long) = {
      val fx = goertzelFx(c, "acc.a", spark = true)
      s"aggregate(vals, named_struct('a', CAST(0 AS BIGINT), " +
        s"'b', CAST(0 AS BIGINT)), " +
        s"(acc, x) -> named_struct('a', x + $fx - acc.b, 'b', acc.a))"
    }
    def power(st: String, c: Long) = {
      val fx = goertzelFx(c, s"$st.a", spark = true)
      s"CAST(greatest(CAST($st.a AS DECIMAL(38,0)) * $st.a " +
        s"+ CAST($st.b AS DECIMAL(38,0)) * $st.b " +
        s"- CAST($fx AS DECIMAL(38,0)) * $st.b, CAST(0 AS DECIMAL(38,0)))" +
        s" div 1000000 AS BIGINT)"
    }
    t(spark, dir, "events")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .agg(count(lit(1)).as("n_days"),
        expr("transform(sort_array(collect_list(struct(day, x))), " +
          "p -> p.x)").as("vals"))
      .withColumn("s7", expr(fold(c7)))
      .withColumn("s5", expr(fold(c5)))
      .select(col("n_days"), explode(expr(
        s"array(named_struct('period', CAST(7 AS BIGINT), " +
          s"'c14', CAST($c7 AS BIGINT), 's1', s7.a, 's2', s7.b, " +
          s"'power_mega', ${power("s7", c7)}), " +
          s"named_struct('period', CAST(5 AS BIGINT), " +
          s"'c14', CAST($c5 AS BIGINT), 's1', s5.a, 's2', s5.b, " +
          s"'power_mega', ${power("s5", c5)}))")).as("r"))
      .select(col("r.period").as("period"), col("r.c14").as("c14"),
        col("n_days"), col("r.s1").as("s1"), col("r.s2").as("s2"),
        col("r.power_mega").as("power_mega"))
      .orderBy(col("period").desc)
  }

  /** The generated DuckDB replay of [[tsGoertzel]] — both resonators in
    * one recursive CTE, constants and feedback emitted from the same
    * generators. */
  protected def goertzelOracle: String = {
    val c7 = goertzelC(7); val c5 = goertzelC(5)
    def fx(c: Long, s: String) = goertzelFx(c, s, spark = false)
    def power(a: String, b: String, c: Long) =
      s"CAST(greatest(CAST($a AS HUGEINT) * $a + CAST($b AS HUGEINT) * $b" +
        s" - CAST(${fx(c, a)} AS HUGEINT) * $b, 0) // 1000000 AS BIGINT)"
    s"""WITH RECURSIVE days AS (SELECT
           epoch_ns(ts) // 86400000000000 AS day,
           CAST(count(*) AS BIGINT) AS x
         FROM events GROUP BY 1),
       s AS (SELECT CAST(count(*) AS BIGINT) AS n,
               list(x ORDER BY day) AS vals FROM days),
       r AS (SELECT 0 AS i, CAST(0 AS BIGINT) AS a7, CAST(0 AS BIGINT)
               AS b7, CAST(0 AS BIGINT) AS a5, CAST(0 AS BIGINT) AS b5
             UNION ALL
             SELECT i + 1,
               s.vals[i + 1] + ${fx(c7, "a7")} - b7, a7,
               s.vals[i + 1] + ${fx(c5, "a5")} - b5, a5
             FROM r, s WHERE i < s.n),
       f AS (SELECT r.* FROM r, s WHERE r.i = s.n)
       SELECT * FROM (
         SELECT CAST(7 AS BIGINT) AS period, CAST($c7 AS BIGINT) AS c14,
           s.n AS n_days, f.a7 AS s1, f.b7 AS s2,
           ${power("f.a7", "f.b7", c7)} AS power_mega
         FROM f, s
         UNION ALL
         SELECT CAST(5 AS BIGINT), CAST($c5 AS BIGINT), s.n, f.a5, f.b5,
           ${power("f.a5", "f.b5", c5)}
         FROM f, s)
       ORDER BY period DESC"""
  }

  /** Matrix profile over the daily purchase-cents series (Yeh et al.
    * 2016, "Matrix Profile I", ICDM) — for every length-7 subsequence,
    * the distance to its nearest non-trivial neighbor: small profile
    * values are motifs (a repeated weekly shape), large ones are
    * discords (the week unlike any other — the anomaly read). Engine
    * contract deviates from the paper's z-normalized Euclidean in two
    * documented ways, both for exactness: the distance is UNnormalized
    * L1 (Σ|vᵢ₊ₖ − vⱼ₊ₖ|, exact in BIGINT — no square ever approaches
    * the 64-bit cliff at hot-key sf1, the wave-11 lesson), and the
    * exclusion zone is |i−j| ≥ ⌈m/2⌉ = 4 (the paper's trivial-match
    * guard). Subsequences whose admissible neighbor set is empty
    * (series shorter than 11 days) drop out. Scale shape: ONE corpus
    * pass (the day-grain aggregate); everything after is bounded by
    * the CALENDAR — the zero-filled series, the pair set, and the
    * 7-offset value joins are all broadcastable at any corpus scale,
    * the reduce-then-pair shape shared with [[tsCcf]]/[[tsSeasonality]].
    * Ties on the minimum break to the smallest neighbor index on both
    * engines (min over (d, j) pairs). */
  protected def tsMatrixProfile(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    val mm = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val cal = mm.select(col("hi"), explode(expr("sequence(lo, hi)")).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), col("hi"),
        coalesce(col("cents"), lit(0L)).as("v"))
    val idx = cal.filter(col("day") <= col("hi") - 6)
      .select(col("day").as("i"))
    val pairs = idx
      .join(broadcast(idx.select(col("i").as("j"))),
        abs(col("i") - col("j")) >= 4)
      .select(col("i"), col("j"), explode(expr("sequence(0L, 6L)")).as("k"))
    val dist = pairs
      .join(broadcast(cal.select(col("day").as("ad"), col("v").as("va"))),
        col("ad") === col("i") + col("k"))
      .join(broadcast(cal.select(col("day").as("bd"), col("v").as("vb"))),
        col("bd") === col("j") + col("k"))
      .groupBy("i", "j")
      .agg(sum(abs(col("va") - col("vb"))).as("d"))
    dist.groupBy("i")
      .agg(min(struct(col("d"), col("j"))).as("m"))
      .select(col("i"), col("m.j").as("nn_idx"), col("m.d").as("nn_dist_l1"))
      .orderBy("i")
  }

  /** Autocorrelation function of the daily event-count series at lags
    * 1..7 — the first diagnostic a forecasting pipeline reads (weekly
    * seasonality shows as a lag-7 peak; a near-unit lag-1 says
    * difference before modeling). FULLY integer via N²-clearing of the
    * mean: with S = Σc over the N calendar days (missing days count 0,
    * so the series is contiguous by construction), r_k·10⁶ =
    * 10⁶·Σ_t (N·c_t − S)(N·c_{t+k} − S) div Σ_t (N·c_t − S)² — the
    * standard ACF estimator with both sides scaled by N², exact in
    * DECIMAL(38,0)/HUGEINT (N ≤ ~4·10⁴ days, counts ≤ 10¹⁰/day at
    * 100 TB ⇒ terms < 10³⁴). The numerator is sign-split (truncation
    * toward zero on both engines); a zero-variance series reads r6
    * NULL. Scale shape: ONE day-keyed aggregate collapses the corpus
    * to a calendar-bounded series; the 7-lag fan-out and the pair
    * join run on that ≤4·10⁴-row relation, never on events. */
  protected def tsAcf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val day = 86400000000000L
    val counts = t(spark, dir, "events")
      .select(expr(s"ts div $day").as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
    val full = counts.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .localCheckpoint(true) // feeds moments, denominator, both pair sides
    val m = full.agg(count(lit(1)).cast(dec).as("nn"),
      sum(col("cnt").cast(dec)).as("s"))
    val den = full.crossJoin(broadcast(m))
      .agg(sum(expr("(nn * cnt - s) * (nn * cnt - s)")).as("den"),
        first(col("nn")).as("nn"))
      .select(expr("CAST(nn AS BIGINT)").as("n_days"), col("den"))
    val a = full.select(col("day").as("da"), col("cnt").as("ca"))
    val b = full.select(col("day").as("db"), col("cnt").as("cb"))
    val num = a.crossJoin(broadcast((1L to 7L).toDF("lag")))
      .join(b, col("db") === col("da") + col("lag"))
      .crossJoin(broadcast(m))
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("(nn * ca - s) * (nn * cb - s)")).as("num"))
    num.crossJoin(broadcast(den))
      .select(col("lag"), col("n_days"), col("n_pairs"),
        expr("""CAST(CASE WHEN den = 0 THEN NULL
            ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (abs(num) * 1000000 div den) END AS BIGINT)""")
          .as("r6"))
      .orderBy("lag")
  }

  protected val tsOracleSql: ListMap[String, String] = ListMap(
    // Same N²-cleared ACF estimator; HUGEINT mirrors DECIMAL(38,0) and
    // the sign-split keeps DuckDB's flooring `//` on the magnitude.
    "q_ts_acf" ->
      """WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
         f AS (SELECT g.day, COALESCE(d.cnt, 0) AS cnt
           FROM (SELECT unnest(range(d0, d1 + 1)) AS day FROM bounds) g
           LEFT JOIN d USING (day)),
         m AS (SELECT CAST(count(*) AS HUGEINT) AS nn,
             CAST(sum(cnt) AS HUGEINT) AS s FROM f),
         den AS (SELECT CAST(nn AS BIGINT) AS n_days,
             sum((nn * cnt - s) * (nn * cnt - s)) AS den
           FROM f, m GROUP BY 1),
         ks AS (SELECT unnest(range(1, 8)) AS lag),
         num AS (SELECT ks.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             sum((nn * a.cnt - s) * (nn * b.cnt - s)) AS num
           FROM ks CROSS JOIN f a JOIN f b ON b.day = a.day + ks.lag
             CROSS JOIN m
           GROUP BY 1)
         SELECT CAST(num.lag AS BIGINT) AS lag, den.n_days, num.n_pairs,
           CAST(CASE WHEN den.den = 0 THEN NULL
             ELSE (CASE WHEN num.num < 0 THEN -1 ELSE 1 END)
                  * (abs(num.num) * 1000000 // den.den) END AS BIGINT)
             AS r6
         FROM num, den ORDER BY lag""",
    "q_ts_goertzel" -> goertzelOracle,
    "q_ts_matrix_profile" ->
      """WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         mm AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
         cal AS (SELECT lo + unnest(range(0, CAST(hi - lo + 1 AS BIGINT)))
               AS day, hi
           FROM mm),
         v AS (SELECT c.day, c.hi, CAST(coalesce(d.cents, 0) AS BIGINT)
               AS v
           FROM cal c LEFT JOIN daily d ON c.day = d.day),
         idx AS (SELECT day AS i FROM v WHERE day <= hi - 6),
         pairs AS (SELECT a.i AS i, b.i AS j
           FROM idx a, idx b WHERE abs(a.i - b.i) >= 4),
         ks AS (SELECT unnest(range(0, 7)) AS k),
         dist AS (SELECT p.i, p.j,
             CAST(sum(abs(va.v - vb.v)) AS BIGINT) AS d
           FROM pairs p CROSS JOIN ks
           JOIN v va ON va.day = p.i + ks.k
           JOIN v vb ON vb.day = p.j + ks.k
           GROUP BY p.i, p.j),
         mn AS (SELECT i, min(d) AS d FROM dist GROUP BY i)
         SELECT CAST(dist.i AS BIGINT) AS i,
           CAST(min(dist.j) AS BIGINT) AS nn_idx,
           CAST(mn.d AS BIGINT) AS nn_dist_l1
         FROM dist JOIN mn ON dist.i = mn.i AND dist.d = mn.d
         GROUP BY dist.i, mn.d ORDER BY i""",
    "q_ts_decompose" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         d2 AS (SELECT *, (day + 4) % 7 AS dow,
             CAST(sum(x) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS s7,
             count(*) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_days
           FROM daily),
         tr AS (SELECT event_type, day, dow, x, n_days,
             s7 * 1000000 // 7 AS trend_micro,
             x * 1000000 - s7 * 1000000 // 7 AS d
           FROM d2 WHERE c7 = 7),
         seas AS (SELECT event_type, dow,
             CAST(count(*) AS BIGINT) AS n_days_dow,
             CAST(sum(d) AS BIGINT) AS sd,
             CAST(max(n_days) AS BIGINT) AS n_days
           FROM tr GROUP BY 1, 2),
         s2 AS (SELECT *, CASE WHEN sd < 0
               THEN -((-sd) // n_days_dow)
               ELSE sd // n_days_dow END AS seasonal_micro
           FROM seas),
         rem AS (SELECT tr.event_type,
             CAST(count(*) AS BIGINT) AS n_trend_days,
             CAST(sum(abs(tr.d - s2.seasonal_micro)) AS BIGINT) AS sabs
           FROM tr JOIN s2 ON tr.event_type = s2.event_type
             AND tr.dow = s2.dow
           GROUP BY 1)
         SELECT s2.event_type, CAST(s2.dow AS BIGINT) AS dow,
           s2.n_days_dow, s2.seasonal_micro, s2.n_days,
           rem.n_trend_days, sabs // n_trend_days AS rem_mad_micro
         FROM s2 JOIN rem ON s2.event_type = rem.event_type
         ORDER BY s2.event_type, dow""",
    "q_ts_sax" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS x
           FROM events GROUP BY 1, 2),
         idx AS (SELECT event_type, day, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS BIGINT) AS i,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY x, day)
               AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         q AS (SELECT event_type,
             max(CASE WHEN r = (n + 3) // 4 THEN x END) AS q1,
             max(CASE WHEN r = (n + 1) // 2 THEN x END) AS q2,
             max(CASE WHEN r = (3 * n + 3) // 4 THEN x END) AS q3,
             max(n) AS n_days
           FROM idx GROUP BY 1),
         seg AS (SELECT event_type, (i - 1) // 4 AS seg,
             CAST(sum(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS l
           FROM idx GROUP BY 1, 2),
         sym AS (SELECT seg.event_type, seg.seg, q.n_days,
             chr(97 + (CASE WHEN s > q1 * l THEN 1 ELSE 0 END)
               + (CASE WHEN s > q2 * l THEN 1 ELSE 0 END)
               + (CASE WHEN s > q3 * l THEN 1 ELSE 0 END)) AS sym
           FROM seg JOIN q USING (event_type)),
         word AS (SELECT event_type, CAST(max(n_days) AS BIGINT) AS n_days,
             CAST(count(*) AS BIGINT) AS n_segments,
             string_agg(sym, '' ORDER BY seg) AS sax_word
           FROM sym GROUP BY 1),
         tri AS (SELECT event_type, sym
               || lead(sym, 1) OVER (PARTITION BY event_type ORDER BY seg)
               || lead(sym, 2) OVER (PARTITION BY event_type ORDER BY seg)
               AS m
           FROM sym),
         mc AS (SELECT event_type, m, CAST(count(*) AS BIGINT) AS c
           FROM tri WHERE m IS NOT NULL GROUP BY 1, 2),
         top AS (SELECT event_type, m AS top_motif, c AS motif_count
           FROM (SELECT event_type, m, c, row_number() OVER (
                   PARTITION BY event_type ORDER BY c DESC, m) AS rn
                 FROM mc) WHERE rn = 1)
         SELECT word.event_type, n_days, n_segments, sax_word,
           top_motif, motif_count
         FROM word LEFT JOIN top USING (event_type)
         ORDER BY event_type""",
    "q_ts_perm_entropy" ->
      """WITH daily AS (SELECT event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         tri AS (SELECT event_type, x,
             lead(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS x1,
             lead(x, 2) OVER (PARTITION BY event_type ORDER BY day) AS x2
           FROM daily),
         pat AS (SELECT event_type,
             CAST(CASE WHEN x1 < x THEN 4 ELSE 0 END
               + CASE WHEN x2 < x THEN 2 ELSE 0 END
               + CASE WHEN x2 < x1 THEN 1 ELSE 0 END AS BIGINT) AS pat
           FROM tri WHERE x2 IS NOT NULL),
         c AS (SELECT event_type, pat, CAST(count(*) AS BIGINT) AS cnt
           FROM pat GROUP BY 1, 2),
         a AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_patterns,
             CAST(sum(CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6)
               AS HUGEINT) * cnt) AS HUGEINT) AS se
           FROM c GROUP BY 1),
         h AS (SELECT event_type, n AS n_triples, n_patterns,
             CAST((CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6) AS HUGEINT)
               * n - se) // n AS BIGINT) AS h_micro
           FROM a)
         SELECT event_type, n_triples, n_patterns, h_micro,
           h_micro * 10000 // 1791759 AS npe_bp
         FROM h ORDER BY event_type""",
    "q_ts_croston" ->
      """WITH d0 AS (SELECT p_brand,
             CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS day,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
           FROM lineitem JOIN part ON l_partkey = p_partkey),
         dm AS (SELECT p_brand, day, CAST(sum(q) AS BIGINT) AS x
           FROM d0 GROUP BY 1, 2),
         l64 AS (SELECT * FROM dm QUALIFY row_number()
           OVER (PARTITION BY p_brand ORDER BY day DESC) <= 64),
         arrs AS (SELECT p_brand, list([day, x] ORDER BY day) AS pts
           FROM l64 GROUP BY 1),
         folded AS (SELECT p_brand,
             CAST(len(pts) AS BIGINT) AS n_points,
             list_reduce(
               [[pts[1][2], CAST(1 AS BIGINT), pts[1][1]]] || pts[2:],
               (acc, e) -> [
                 acc[1] + CASE WHEN e[2] - acc[1] < 0
                   THEN -((-(e[2] - acc[1])) // 5)
                   ELSE (e[2] - acc[1]) // 5 END,
                 acc[2] + CASE WHEN (e[1] - acc[3]) - acc[2] < 0
                   THEN -((-((e[1] - acc[3]) - acc[2])) // 5)
                   ELSE ((e[1] - acc[3]) - acc[2]) // 5 END,
                 e[1]]) AS st
           FROM arrs)
         SELECT p_brand, n_points, st[1] AS z_size, st[2] AS p_interval,
           st[1] * 10000 // st[2] AS forecast4
         FROM folded ORDER BY p_brand""",
    "q_ts_dtw" ->
      """WITH cnt AS (SELECT event_type,
             (epoch_ns(ts) // 86400000000000) % 31 AS ph,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1, 2),
         types AS (SELECT DISTINCT event_type FROM cnt),
         grid AS (SELECT event_type, g.i FROM types, range(0, 31) g(i)),
         dense AS (SELECT grid.event_type, grid.i,
             coalesce(cnt.c, 0) AS c
           FROM grid LEFT JOIN cnt
             ON grid.event_type = cnt.event_type AND grid.i = cnt.ph),
         vecs AS (SELECT event_type, list(c ORDER BY i) AS v
           FROM dense GROUP BY 1),
         pairs AS (SELECT a.event_type AS ta, b.event_type AS tb,
             a.v AS av, b.v AS bv
           FROM vecs a JOIN vecs b ON a.event_type < b.event_type),
         dp AS (SELECT ta, tb,
             (list_reduce(
               [[CAST(abs(av[1] - bv[1]) AS BIGINT)]] ||
               list_transform(range(1, 961), t -> [CAST(t AS BIGINT)]),
               (acc, x) -> acc || [
                 CASE WHEN abs(x[1] // 31 - x[1] % 31) > 5
                   THEN CAST(1000000000000000 AS BIGINT)
                 ELSE CASE WHEN least(
                     CASE WHEN x[1] % 31 > 0 THEN acc[x[1]]
                          ELSE CAST(1000000000000000 AS BIGINT) END,
                     CASE WHEN x[1] // 31 > 0 THEN acc[x[1] - 30]
                          ELSE CAST(1000000000000000 AS BIGINT) END,
                     CASE WHEN x[1] // 31 > 0 AND x[1] % 31 > 0
                          THEN acc[x[1] - 31]
                          ELSE CAST(1000000000000000 AS BIGINT) END)
                     >= 1000000000000000
                   THEN CAST(1000000000000000 AS BIGINT)
                 ELSE abs(av[x[1] // 31 + 1] - bv[x[1] % 31 + 1]) + least(
                     CASE WHEN x[1] % 31 > 0 THEN acc[x[1]]
                          ELSE CAST(1000000000000000 AS BIGINT) END,
                     CASE WHEN x[1] // 31 > 0 THEN acc[x[1] - 30]
                          ELSE CAST(1000000000000000 AS BIGINT) END,
                     CASE WHEN x[1] // 31 > 0 AND x[1] % 31 > 0
                          THEN acc[x[1] - 31]
                          ELSE CAST(1000000000000000 AS BIGINT) END)
                 END END]))[961] AS dtw,
             CAST(list_sum(list_transform(range(0, 31),
               i -> abs(av[i + 1] - bv[i + 1]))) AS BIGINT) AS l1
           FROM pairs)
         SELECT ta AS type_a, tb AS type_b, dtw, l1,
           CASE WHEN l1 = 0 THEN CAST(0 AS BIGINT)
                ELSE (l1 - dtw) * 10000 // l1 END AS gain_bp
         FROM dp ORDER BY type_a, type_b""",
    "q_ts_resample" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 60000000000 AS bin_minute, value
                    FROM events WHERE user_id < 5),
         binned AS (SELECT user_id, bin_minute, count(*) AS n_events,
                      CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS bin_value
                    FROM e GROUP BY user_id, bin_minute),
         spans AS (SELECT user_id, min(bin_minute) AS lo, max(bin_minute) AS hi
                   FROM binned GROUP BY user_id),
         grid AS (SELECT user_id, unnest(range(lo, hi + 1)) AS bin_minute FROM spans)
         SELECT g.user_id, g.bin_minute,
                COALESCE(b.n_events, 0) AS n_events,
                last_value(b.bin_value IGNORE NULLS) OVER (
                  PARTITION BY g.user_id ORDER BY g.bin_minute
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM grid g LEFT JOIN binned b
           ON g.user_id = b.user_id AND g.bin_minute = b.bin_minute
         ORDER BY g.user_id, g.bin_minute""",
    // EWMA replay: same integer bin units, list_reduce runs the same
    // (v + 3s) // 4 recurrence over the same bin-sorted series.
    "q_ts_ewma" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) // 60000000000 AS bin,
             CAST(floor(value * 10000 + 0.5) AS BIGINT) AS u
           FROM events WHERE user_id < 5),
         b AS (SELECT user_id, bin, CAST(sum(u) AS BIGINT) AS bu
               FROM e GROUP BY 1, 2),
         s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_bins,
                 list(bu ORDER BY bin) AS vals
               FROM b GROUP BY 1)
         SELECT user_id, n_bins, vals[1] AS first_units,
           vals[-1] AS last_units,
           CAST(list_reduce(vals, (acc, x) -> (x + 3 * acc) // 4)
             AS BIGINT) AS ewma_units
         FROM s ORDER BY user_id""",
    // Seasonality replay: same integer epoch day-of-week, same cleared
    // per-group floor(S²·10⁶ // c) sums of squares, same single division.
    "q_ts_seasonality" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         d2 AS (SELECT (day + 4) % 7 AS dow, x FROM days),
         g AS (SELECT dow, CAST(count(*) AS BIGINT) AS c,
                 CAST(sum(x) AS BIGINT) AS s,
                 CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q,
                 (CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS HUGEINT)
                   * 1000000) // CAST(count(*) AS HUGEINT) AS gb
               FROM d2 GROUP BY 1),
         tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
                   CAST(sum(s) AS HUGEINT) AS st,
                   CAST(sum(q) AS HUGEINT) AS qt,
                   CAST(sum(gb) AS HUGEINT) AS sgb
                 FROM g),
         eta AS (SELECT CAST(n AS BIGINT) AS n_days,
                   FLOOR(CAST(sgb - (st * st * 1000000) // n AS DOUBLE)
                     / CAST(qt * 1000000 - (st * st * 1000000) // n
                       AS DOUBLE) * 1e6) / 1e6 AS eta6
                 FROM tot)
         SELECT CAST(g.dow AS BIGINT) AS dow, g.c AS n_days_dow,
           CAST((CAST(g.s AS HUGEINT) * 1000000) // g.c AS BIGINT)
             AS mean_micro,
           eta.n_days, eta.eta6
         FROM g, eta ORDER BY dow""",
    // CUSUM replay: same n-scaled integer cumulative statistic, same
    // earliest-day argmax tie-break, same micro-unit level means.
    "q_ts_changepoint" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS tt FROM days),
         cus AS (SELECT day, x,
                   CAST(sum(x * n - tt) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS s
                 FROM days, tot),
         cp AS (SELECT day AS cp_day, abs(s) AS s_abs
                FROM cus ORDER BY abs(s) DESC, day LIMIT 1)
         SELECT CAST(count(*) AS BIGINT) AS n_days, cp_day, s_abs,
           CAST(sum(CASE WHEN day <= cp_day THEN x END) * 1000000
             // sum(CASE WHEN day <= cp_day THEN 1 ELSE 0 END) AS BIGINT)
             AS mean_before_micro,
           CAST(CASE WHEN sum(CASE WHEN day > cp_day THEN 1 ELSE 0 END) = 0
             THEN NULL
             ELSE sum(CASE WHEN day > cp_day THEN x END) * 1000000
               // sum(CASE WHEN day > cp_day THEN 1 ELSE 0 END) END
             AS BIGINT) AS mean_after_micro
         FROM days, cp GROUP BY cp_day, s_abs""",
    // Hampel replay: same 7-slot rolling list, same integer median/MAD
    // picks, same 3-MAD integer compare.
    "q_ts_hampel" ->
      """WITH days AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1),
         win AS (SELECT day, x, list(x) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS lst
           FROM days),
         f7 AS (SELECT day, x, lst, list_sort(lst)[4] AS med
                FROM win WHERE len(lst) = 7),
         m AS (SELECT day, x, med,
                 list_sort(list_transform(lst, e -> abs(e - med)))[4] AS mad
               FROM f7)
         SELECT day, x, med, mad, abs(x - med) > 3 * mad AS is_outlier
         FROM m ORDER BY day""",
    // Holt replay: a RECURSIVE CTE carries the identical (level, trend)
    // integer recurrence (DuckDB 1.0.0 list_reduce mis-accumulates
    // struct accumulators, so the fold mechanism differs; the
    // arithmetic is step-identical).
    "q_ts_holt" ->
      """WITH RECURSIVE days AS (SELECT
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) * 10000 AS BIGINT) AS x
           FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 list(x ORDER BY day) AS vals FROM days),
         r AS (SELECT 2 AS i, vals[2] AS l, vals[2] - vals[1] AS b FROM s
               UNION ALL
               SELECT i + 1, (s.vals[i + 1] + 3 * (l + b)) // 4,
                 ((s.vals[i + 1] + 3 * (l + b)) // 4 - l + 3 * b) // 4
               FROM r, s WHERE i < s.n)
         SELECT s.n AS n_days, r.l AS level_units, r.b AS trend_units,
           r.l + r.b AS forecast_units
         FROM r, s WHERE r.i = s.n AND s.n >= 2""",
    // CCF replay: same day-grain conditional counts, same 0..7-lag
    // banded self-join of the tiny day aggregate, HUGEINT exact moments
    // (DuckDB's 128-bit integer = the engine's DECIMAL(38,0) discipline),
    // one num/sqrt double surface floored 4dp, zero-variance lag -> 0.
    "q_ts_ccf" ->
      """WITH d AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               AS HUGEINT) AS x,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS HUGEINT) AS y
           FROM events GROUP BY 1),
         p AS (SELECT b.day - a.day AS lag, a.x AS x, b.y AS y
               FROM d a JOIN d b ON b.day - a.day BETWEEN 0 AND 7),
         m AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
           FROM p GROUP BY lag)
         SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
           THEN CAST(0.0 AS DOUBLE)
           ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) * 10000) / 10000
           END AS r4
         FROM m ORDER BY lag""",
    // PACF replay: day-grain list ordered by day, ascending-t
    // autocovariance folds (explicit list_reduce with a 0.0 seed — order
    // pinned), then the Durbin-Levinson recursion carrying the phi row
    // as LIST<DOUBLE>; prototyped standalone against a Python fold.
    "q_ts_pacf" ->
      """WITH RECURSIVE days AS (SELECT
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         xs AS (SELECT list(c ORDER BY day) AS x FROM days),
         st AS (SELECT x, CAST(len(x) AS BIGINT) AS n,
             CAST(list_reduce(x, (a, b) -> a + b) AS BIGINT) AS s
           FROM xs WHERE len(x) >= 8),
         mn AS (SELECT x, n,
             CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m FROM st),
         gam AS (SELECT
             list_transform(range(0, 8), k ->
               list_reduce(
                 list_concat([CAST(0.0 AS DOUBLE)],
                   list_transform(range(1, CAST(n AS INT) - CAST(k AS INT) + 1),
                     t -> (x[t] - m) * (x[t + k] - m))),
                 (a, b) -> a + b) / CAST(n AS DOUBLE)) AS g
           FROM mn),
         dl AS (
           SELECT 1 AS k, [g[2] / g[1]] AS phi,
             g[1] * (1.0 - (g[2] / g[1]) * (g[2] / g[1])) AS v, g
           FROM gam WHERE g[1] <> 0
           UNION ALL
           SELECT k + 1,
             list_concat(
               list_transform(range(1, k + 1), j -> phi[j] -
                 ((g[k + 2] - list_reduce(
                     list_concat([CAST(0.0 AS DOUBLE)],
                       list_transform(range(1, k + 1),
                         j2 -> phi[j2] * g[k + 2 - j2])),
                     (a, b) -> a + b)) / v) * phi[k + 1 - j]),
               [(g[k + 2] - list_reduce(
                   list_concat([CAST(0.0 AS DOUBLE)],
                     list_transform(range(1, k + 1),
                       j2 -> phi[j2] * g[k + 2 - j2])),
                   (a, b) -> a + b)) / v]) AS phi,
             v * (1.0 - ((g[k + 2] - list_reduce(
                   list_concat([CAST(0.0 AS DOUBLE)],
                     list_transform(range(1, k + 1),
                       j2 -> phi[j2] * g[k + 2 - j2])),
                   (a, b) -> a + b)) / v)
                 * ((g[k + 2] - list_reduce(
                   list_concat([CAST(0.0 AS DOUBLE)],
                     list_transform(range(1, k + 1),
                       j2 -> phi[j2] * g[k + 2 - j2])),
                   (a, b) -> a + b)) / v)) AS v,
             g
           FROM dl WHERE k < 7)
         SELECT CAST(k AS BIGINT) AS lag,
           floor(phi[k] * 10000) / 10000 AS pacf4
         FROM dl ORDER BY k""",
    // Backtest replay: the q_ts_holt recursive CTE with (sae, ssm)
    // carried beside (l, b) — forecasts read the PRE-update state —
    // plus the naive |x_t − x_{t-1}| window for MASE.
    "q_ts_backtest" ->
      """WITH RECURSIVE days AS (SELECT
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) * 10000 AS BIGINT) AS x
           FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 list(x ORDER BY day) AS vals FROM days),
         r AS (SELECT 2 AS i, vals[2] AS l, vals[2] - vals[1] AS b,
                 CAST(0 AS BIGINT) AS sae, CAST(0 AS BIGINT) AS ssm
               FROM s
               UNION ALL
               SELECT i + 1, (s.vals[i + 1] + 3 * (l + b)) // 4,
                 ((s.vals[i + 1] + 3 * (l + b)) // 4 - l + 3 * b) // 4,
                 sae + abs(s.vals[i + 1] - l - b),
                 ssm + 2 * abs(s.vals[i + 1] - l - b) * 10000
                   // (abs(s.vals[i + 1]) + abs(l + b))
               FROM r, s WHERE i < s.n),
         nv AS (SELECT CAST(coalesce(list_sum(list_transform(
                   range(3, CAST(n AS INT) + 1),
                   i -> abs(vals[i] - vals[i - 1]))), 0) AS BIGINT)
                  AS naive
                FROM s)
         SELECT s.n AS n_days, s.n - 2 AS n_eval, r.sae AS sae_units,
           r.ssm // (s.n - 2) AS smape4,
           CASE WHEN nv.naive = 0 THEN 0
                ELSE r.sae * 10000 // nv.naive END AS mase4
         FROM r, s, nv WHERE r.i = s.n AND s.n >= 3""",
    // Conformal replay: the same recursive Holt CTE emitting each
    // step's PRE-update |residual| as a row, chronological 2/3 split,
    // rank window for the k-th smallest calibration residual, coverage
    // on the tail.
    "q_ts_conformal" ->
      """WITH RECURSIVE days AS (SELECT
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) * 10000 AS BIGINT) AS x
           FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 list(x ORDER BY day) AS vals FROM days),
         r AS (SELECT 2 AS i, vals[2] AS l, vals[2] - vals[1] AS b,
                 CAST(NULL AS BIGINT) AS res
               FROM s
               UNION ALL
               SELECT i + 1, (s.vals[i + 1] + 3 * (l + b)) // 4,
                 ((s.vals[i + 1] + 3 * (l + b)) // 4 - l + 3 * b) // 4,
                 abs(s.vals[i + 1] - l - b)
               FROM r, s WHERE i < s.n),
         resid AS (SELECT i - 2 AS step, res FROM r WHERE i >= 3),
         kq AS (SELECT CAST(count(*) AS BIGINT) AS m,
                  2 * CAST(count(*) AS BIGINT) // 3 AS c,
                  least((9 * (2 * CAST(count(*) AS BIGINT) // 3) + 18)
                    // 10, 2 * CAST(count(*) AS BIGINT) // 3) AS k
                FROM resid),
         qh AS (SELECT res AS qhat FROM (
                  SELECT res, row_number() OVER (ORDER BY res) AS rn
                  FROM resid, kq WHERE step <= c), kq
                WHERE rn = k),
         cv AS (SELECT CAST(sum(CASE WHEN t.res <= qh.qhat
                    THEN 1 ELSE 0 END) AS BIGINT) AS hits
                FROM resid t, kq, qh WHERE t.step > kq.c)
         SELECT s.n AS n_days, kq.c AS n_cal, kq.m - kq.c AS n_test,
           qh.qhat AS qhat_units,
           cv.hits * 10000 // (kq.m - kq.c) AS coverage4
         FROM s, kq, qh, cv WHERE s.n >= 4""",
    // Holt–Winters replay: recursive CTE carrying (l, b, seasonal LIST)
    // through the identical integer recurrence; the l' expression is
    // inlined into b' and s' exactly as the Spark fold does.
    "q_ts_holt_winters" ->
      """WITH RECURSIVE days AS (SELECT
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(count(*) * 10000 AS BIGINT) AS x
           FROM events GROUP BY 1),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 list(x ORDER BY day) AS vals FROM days),
         init AS (SELECT n, vals,
             CAST((vals[1] + vals[2] + vals[3] + vals[4] + vals[5]
               + vals[6] + vals[7]) // 7 AS BIGINT) AS l0
           FROM s WHERE n >= 8),
         r AS (SELECT 7 AS i, l0 AS l, CAST(0 AS BIGINT) AS b,
                 list_transform(range(1, 8), j -> vals[j] - l0) AS se,
                 n, vals
               FROM init
               UNION ALL
               SELECT i + 1,
                 (vals[i + 1] - se[(i % 7) + 1] + 3 * (l + b)) // 4,
                 (((vals[i + 1] - se[(i % 7) + 1] + 3 * (l + b)) // 4)
                   - l + 3 * b) // 4,
                 list_transform(range(1, 8), j ->
                   CASE WHEN j = (i % 7) + 1
                     THEN (vals[i + 1]
                       - ((vals[i + 1] - se[(i % 7) + 1]
                         + 3 * (l + b)) // 4)
                       + 3 * se[(i % 7) + 1]) // 4
                     ELSE se[j] END),
                 n, vals
               FROM r WHERE i < n)
         SELECT n AS n_days, l AS level_units, b AS trend_units,
           se[(n % 7) + 1] AS next_seasonal_units,
           l + b + se[(n % 7) + 1] AS forecast_units,
           se[1] AS seas1, se[2] AS seas2, se[3] AS seas3,
           se[4] AS seas4, se[5] AS seas5, se[6] AS seas6,
           se[7] AS seas7
         FROM r WHERE i = n""",
  )
}
