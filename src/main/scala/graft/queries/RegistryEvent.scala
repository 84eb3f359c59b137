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

/** Event-stream batch queries (sessionization, funnels, windows).
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryEvent extends RegistryTs {

  protected def eEventsSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 4))).cast("double").as("total_value"),
        countDistinct(col("user_id")).as("users"))
      .orderBy("event_type")

  // ------------------------------------------------------- Readers / headers

  /** Last-touch conversion attribution: for every purchase, the latest
    * PRECEDING non-purchase event (the touch that gets the credit), via
    * one per-user sorted window max over a struct-packed (ts, id, type)
    * candidate — no self-join of conversions against history. Struct max
    * ignores the NULL (purchase) candidates and breaks ties by the
    * unique event id, so attribution is total and engine-replayable. */
  protected def eAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touched = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_cand", when(col("event_type") =!= "purchase",
        struct(col("ts"), col("event_id"), col("event_type"))))
      .withColumn("_last", max(col("_cand")).over(w))
    val conv = touched.filter(col("event_type") === "purchase")
      .select(coalesce(col("_last.event_type"), lit("none"))
        .as("last_touch"))
    conv.groupBy("last_touch").agg(count(lit(1)).as("n_conversions"))
      .withColumn("frac", floor(col("n_conversions") * 10000.0
        / sum(col("n_conversions"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy())
        + 0.5) / 10000)
      .orderBy("last_touch")
  }

  /** Time-RANGE sliding window: per-user sum/count of event values over
    * the PRECEDING HOUR of event time (range frame on the ts axis, not a
    * row count) — the "activity in the last hour at every event" feature
    * a fraud/engagement model reads. One shuffle by user, one
    * in-partition sort shared by both frame aggregates; decimal sums so
    * frame-merge order cannot drift the doubles. */
  protected def wTimeRangeSum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourNs = 3600L * 1000 * 1000 * 1000
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-hourNs, 0)
    t(spark, dir, "events").filter(col("user_id") < 20)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        (floor(sum(col("value").cast(DecimalType(20, 4))).over(w)
          .cast("double") * 1e4 + 0.5) / 1e4).as("sum_last_hour"))
      .orderBy("user_id", "event_id")
  }

  /** Event-type transition matrix (first-order Markov structure of the
    * event stream — the path-analysis primitive behind "what do users do
    * after X"). One shuffle by user, one in-partition sorted window for
    * the lag pairing; the transition-count relation is |types|²-bounded
    * (≤ 25 rows here), so the share-of-total window over IT is a
    * KB-scale single partition by construction. */
  protected def eTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("frac", floor(col("n") * 10000.0
        / sum(col("n")).over(Window.partitionBy()) + 0.5) / 10000)
      .orderBy(col("n").desc, col("prev_type"), col("next_type"))
      .limit(20)
  }

  /** Top event-type trigram paths (the order-2 extension of
    * [[eTransitions]]' bigrams — "view→view→purchase vs
    * view→purchase→purchase" is where funnel shape lives; the Markov
    * queries assume order-1, this measures what order-1 misses):
    * per-user time-ordered lag×2 window, global top-20 by count with
    * (path, count) total order, frac₄ = n·10⁴ div total trigrams —
    * integer. Scale shape: the per-user window is the sessionization
    * shape (partitioned, never corpus-wide); top-20 is a
    * TakeOrderedAndProject. */
  protected def eTrigrams(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tri = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
    tri.crossJoin(broadcast(tri.agg(sum(col("n")).as("tot"))))
      .select(col("t1"), col("t2"), col("t3"), col("n"),
        expr("n * 10000 div tot").as("frac4"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  /** Cohort revenue / ARPU matrix (the MONETARY companion of
    * [[eRetention]]'s activity matrix): users cohorted by first-event
    * week, purchase value in exact cents summed per (cohort, weeks
    * since), arpu₄ = cents div cohort_n (cents-per-user, truncating).
    * Scale shape: identical to retention — one cohort join, the
    * cohort-size relation broadcasts back. */
  protected def eCohortRevenue(spark: SparkSession, dir: String): DataFrame = {
    val weekNs = 7L * 24 * 3600 * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $weekNs").as("wk"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val first = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val cohortSizes = first.groupBy("cohort_wk")
      .agg(count(lit(1)).as("cohort_n"))
    e.filter(col("event_type") === "purchase")
      .join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_since"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
      .join(broadcast(cohortSizes), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("wk_since"), col("n_purchases"),
        col("cents"), expr("cents div cohort_n").as("arpu_cents"))
      .orderBy("cohort_wk", "wk_since")
  }

  /** Signup→purchase conversion-lag histogram — the funnel-TIMING
    * diagnostic between funnel conversion (does the user convert) and
    * survival (when does activity stop): per signed-up user, days from
    * first signup to the first purchase AT OR AFTER it, bucketed
    * (0/1/2/3_6/7_13/14_plus/none) with each bucket's share frac4
    * against all signed-up users. Scale shape: one equi-join on
    * user_id (purchases reduce per-user inside the join's aggregate),
    * bounded bucket relation, total broadcasts back. */
  protected def eLagToConvert(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"))
    val s = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("day").as("sd"))
    val conv = e.filter(col("event_type") === "purchase")
      .join(s, Seq("user_id"))
      .filter(col("day") >= col("sd"))
      .groupBy("user_id").agg(min(col("day") - col("sd")).as("lag"))
    val buckets = s.join(conv, Seq("user_id"), "left")
      .select(when(col("lag").isNull, "none")
        .when(col("lag") === 0, "0").when(col("lag") === 1, "1")
        .when(col("lag") === 2, "2").when(col("lag") <= 6, "3_6")
        .when(col("lag") <= 13, "7_13").otherwise("14_plus").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_users"))
    buckets.crossJoin(broadcast(s.agg(count(lit(1)).as("total"))))
      .select(col("bucket"), col("n_users"),
        expr("n_users * 10000 div total").as("frac4"))
      .orderBy("bucket")
  }

  /** Fixed-point half-life weights ⌊2²⁰·2^(−age/7) + ½⌋ for ages 0..62
    * days, computed once and emitted into BOTH engines (the ndcgW /
    * DCT-basis precedent: one shared literal table, no float drift).
    * Ages past the horizon weigh 0 (< 0.22% of fresh weight). */
  private val decayW: IndexedSeq[Long] = (0 to 62).map(a =>
    math.floor(math.pow(2.0, 20.0 - a / 7.0) + 0.5).toLong)

  /** Time-decayed engagement scoring with a 7-day half-life — the
    * recency-weighted feature every ranking/CRM pipeline derives before
    * anything else (decayed counts: Cormode, Shkapenyuk, Srivastava &
    * Xu 2009 frame the backward/forward-decay trade-off; this is the
    * classic backward form anchored at the corpus max day). Per user:
    * decayed event mass Σ w(age) and decayed purchase cents
    * Σ cents·w(age), both in 2²⁰ fixed point via the shared [[decayW]]
    * table — FULLY integer, no pow()/exp() anywhere near the data.
    * Scale shape: one events pass; the weight lookup is a 63-row
    * BROADCAST join on age (never a per-row pow), the max-day anchor a
    * 1-row broadcast; wide sums in DECIMAL(38,0); top-20 by decayed
    * cents with a user_id tie-break. */
  protected def eDecayScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dec = DecimalType(38, 0)
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val mx = ev.agg(max("day").as("max_day"))
    val w = decayW.zipWithIndex
      .map { case (wv, a) => (a.toLong, wv) }.toDF("age", "w")
    ev.crossJoin(broadcast(mx))
      .withColumn("age", col("max_day") - col("day"))
      .join(broadcast(w), Seq("age"), "left")
      .withColumn("wv", coalesce(col("w"), lit(0L)))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("wv").cast(dec)).as("ew"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L).cast(dec) * col("wv")).as("cw"))
      .select(col("user_id"), col("n_events"),
        col("ew").cast("long").as("events_w20"),
        col("cw").cast("long").as("cents_w20"))
      .orderBy(col("cents_w20").desc, col("user_id"))
      .limit(20)
  }

  /** The generated DuckDB replay of [[eDecayScore]] — the weight VALUES
    * list emitted from the same [[decayW]] table. */
  protected def decayOracle: String = {
    val values = decayW.zipWithIndex.map { case (wv, a) =>
      if (a == 0) s"(CAST(0 AS BIGINT), CAST($wv AS BIGINT))"
      else s"($a, $wv)"
    }.mkString(", ")
    s"""WITH ev AS (SELECT user_id, event_type,
           epoch_ns(ts) // 86400000000000 AS day,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
       mx AS (SELECT max(day) AS max_day FROM ev),
       w(age, w) AS (VALUES $values),
       j AS (SELECT ev.user_id, ev.event_type, ev.cents,
           coalesce(w.w, 0) AS wv
         FROM ev CROSS JOIN mx
         LEFT JOIN w ON w.age = mx.max_day - ev.day)
       SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(wv AS HUGEINT)) AS BIGINT) AS events_w20,
         CAST(sum(CAST(CASE WHEN event_type = 'purchase' THEN cents
           ELSE 0 END AS HUGEINT) * wv) AS BIGINT) AS cents_w20
       FROM j GROUP BY user_id
       ORDER BY cents_w20 DESC, user_id LIMIT 20"""
  }

  /** RFM segmentation (Hughes 1994's Recency/Frequency/Monetary triple,
    * the canonical CRM user-value cube): per-user recency (days since
    * last purchase, against the corpus max purchase day), frequency
    * (purchase count), and monetary (exact cents), each scored into
    * quintiles via BROADCAST percentile thresholds — the
    * [[RegistryStats]] equi-depth pattern: ONE aggregate computes the
    * four boundaries per dimension (Spark `percentile` buffers
    * value→count, bounded by the DISTINCT day/count/cent universes, not
    * row count), boundaries round to integers, and scoring is a
    * row-local CASE. No corpus-wide ntile window anywhere — the usual
    * RFM recipe's global sort is exactly what dies at 10⁹ users. The
    * 5×5×5 score cube then rolls up under the classic marketing labels
    * (champions / loyal / new / at_risk / hibernating / regular).
    * Recency scores INVERT (low days = good): r_score = 6 − bin. */
  protected def eRfm(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val per = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("cents"))
    val rfm = per
      .crossJoin(broadcast(per.agg(max("last_day").as("max_day"))))
      .select(col("user_id"), (col("max_day") - col("last_day")).as("rec_days"),
        col("freq"), col("cents"))
    val th = rfm.agg(
        expr("percentile(rec_days, array(0.2D, 0.4D, 0.6D, 0.8D))").as("rq"),
        expr("percentile(freq, array(0.2D, 0.4D, 0.6D, 0.8D))").as("fq"),
        expr("percentile(cents, array(0.2D, 0.4D, 0.6D, 0.8D))").as("mq"))
      .select((1 to 4).flatMap(i => Seq(
        floor(element_at(col("rq"), i) + 0.5).cast("long").as(s"r$i"),
        floor(element_at(col("fq"), i) + 0.5).cast("long").as(s"f$i"),
        floor(element_at(col("mq"), i) + 0.5).cast("long").as(s"m$i"))): _*)
    def bin(c: Column, p: String) =
      when(c <= col(s"${p}1"), 1L).when(c <= col(s"${p}2"), 2L)
        .when(c <= col(s"${p}3"), 3L).when(c <= col(s"${p}4"), 4L)
        .otherwise(5L)
    rfm.crossJoin(broadcast(th))
      .select(col("cents"),
        (lit(6L) - bin(col("rec_days"), "r")).as("r_score"),
        bin(col("freq"), "f").as("f_score"),
        bin(col("cents"), "m").as("m_score"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4, "champions")
          .when(col("f_score") >= 4, "loyal")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .otherwise("regular"))
      .groupBy("r_score", "f_score", "m_score", "segment")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("cents"))
      .withColumn("arpu_cents", expr("cents div n_users"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** Stationary distribution of the event-type Markov chain (the
    * power-iteration steady state over [[eTransitions]]' matrix) —
    * "where does user behavior settle": transitions give the one-step
    * dynamics, [[eMarkovEntropy]] their uncertainty, this the
    * long-run occupancy. FULLY integer: row-stochastic entries are
    * P₆ = cnt·10⁶ div rowΣ (truncating), eight iterations of
    * π'_j = Σ_i π_i·P₆(i,j) div 10⁶ from the uniform 10⁶ div k — one
    * flooring per matrix cell per round, replayed by eight unrolled
    * matrix-vector CTEs. Dangling types (no outgoing transitions)
    * evaporate mass, the simplified-PageRank convention. Scale shape:
    * ONE corpus pass builds the ≤k² transition matrix (k = event-type
    * universe, data-independent); the iteration runs driver-side over
    * that bounded relation (the statsCorr collect discipline). */
  protected def eMarkovStationary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val cells = trans
      .withColumn("rt", sum(col("n")).over(
        Window.partitionBy("prev_type")))
      .select(col("prev_type"), col("next_type"),
        expr("n * 1000000 div rt").as("p6"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = t(spark, dir, "events")
      .select(col("event_type")).distinct()
      .orderBy("event_type").collect().map(_.getString(0))
    if (types.isEmpty)
      return Seq.empty[(String, Long)].toDF("event_type", "pi_micro")
    var pi = types.map(t => t -> 1000000L / types.length).toMap
    for (_ <- 1 to 8) {
      val next = scala.collection.mutable.Map(
        types.map(t => t -> 0L): _*)
      cells.foreach { case (i, j, p6) =>
        next(j) += pi(i) * p6 / 1000000L
      }
      pi = next.toMap
    }
    types.map(t => (t, pi(t))).toSeq
      .toDF("event_type", "pi_micro").orderBy("event_type")
  }

  /** Per-state transition entropy of the user-behavior Markov chain —
    * "how predictable is the next event given the current one" (the
    * session-model diagnostic that decides whether next-event prediction
    * is worth building; pairs with [[eTransitions]]' raw counts).
    * Exactness: transition counts are exact integers from the same
    * (ts, event_id)-ordered lag; entropy uses the floor-then-sum
    * per-distinct-value micro-unit discipline of `q_stats_entropy`, so
    * H·n is exact-integer with ONE truncating division per state. */
  protected def eMarkovEntropy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy("prev_type").agg(
        sum(col("c")).as("n_out"),
        count(lit(1)).as("n_next"),
        sum(floor(log(col("c").cast("double")) * 1e6).cast(dec) * col("c"))
          .as("se"))
      .select(col("prev_type"), col("n_out").cast("long").as("n_out"),
        col("n_next"),
        expr("(CAST(floor(ln(CAST(n_out AS DOUBLE)) * 1e6)" +
          " AS DECIMAL(38,0)) * n_out - se) div n_out").as("h_micro"))
      .orderBy("prev_type")
  }

  /** Kaplan–Meier product-limit survival curve for time-to-first-purchase
    * (Kaplan & Meier 1958) — the funnel-latency statistic that handles
    * users who have not converted YET: T = first purchase day − first
    * active day for converters (event), and T = last active day − first
    * active day for never-purchasers (right-CENSORED at the end of their
    * observed follow-up — they were at risk that long without
    * converting; dropping them would bias conversion optimistically).
    * S(t) steps only at conversion times: S = Π (1 − d/n_risk) with
    * events ordered before censorings at ties (the textbook convention).
    * Exactness: FULLY integer — s_micro carries the product as
    * s' = s·(n_risk−d) div n_risk (truncating), replayed by a
    * recursive-CTE in the oracle (the [[tsHolt]] mechanism). Scale
    * shape: one events pass to per-user (first, last, first-purchase),
    * one tiny day-grain aggregate; the suffix-sum window and the fold
    * run over ≤ day-span rows (bounded by the calendar, not the
    * corpus), so the single-partition window is safe at any scale. */
  protected def eSurvival(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events")
      .groupBy("user_id")
      .agg(expr("min(ts div 86400000000000)").as("first_day"),
        expr("max(ts div 86400000000000)").as("last_day"),
        expr("min(CASE WHEN event_type = 'purchase' " +
          "THEN ts div 86400000000000 END)").as("purch_day"))
    val byT = users
      .select(when(col("purch_day").isNotNull,
          col("purch_day") - col("first_day"))
        .otherwise(col("last_day") - col("first_day")).as("t"),
        when(col("purch_day").isNotNull, 1L).otherwise(0L).as("ev"))
      .groupBy("t")
      .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d"),
        sum(lit(1L) - col("ev")).as("c"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    byT.withColumn("n_risk", sum(col("n_at")).over(w))
      .agg(expr("sort_array(collect_list(struct(t, n_risk, d, c)))")
        .as("rows"))
      .select(explode(expr(
        """aggregate(rows,
             named_struct('s', CAST(1000000 AS BIGINT),
               'out', CAST(array() AS ARRAY<STRUCT<t: BIGINT,
                 n_risk: BIGINT, n_events: BIGINT, n_censored: BIGINT,
                 s_micro: BIGINT>>)),
             (acc, e) -> named_struct(
               's', CASE WHEN e.d > 0
                 THEN acc.s * (e.n_risk - e.d) div e.n_risk
                 ELSE acc.s END,
               'out', concat(acc.out, array(named_struct(
                 't', e.t, 'n_risk', e.n_risk, 'n_events', e.d,
                 'n_censored', e.c,
                 's_micro', CASE WHEN e.d > 0
                   THEN acc.s * (e.n_risk - e.d) div e.n_risk
                   ELSE acc.s END)))),
             acc -> acc.out)""")).as("r"))
      .select(col("r.t"), col("r.n_risk"), col("r.n_events"),
        col("r.n_censored"), col("r.s_micro"))
      .filter(col("n_events") > 0)
      .orderBy("t")
  }

  /** Batch gap sessionization over events (30-minute gap; ts is raw nanos
    * on both engines — nanosAsLong here, epoch_ns in the oracle). */
  protected def eSessions(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize.userStats(
        t(spark, dir, "events"), "user_id", "ts", "event_id",
        gap = 30L * 60 * 1000 * 1000 * 1000)
      .orderBy("user_id")

  /** Peak session concurrency per hour — the capacity-planning read
    * ("how many sessions are live at once?") computed WITHOUT the
    * classic global +1/−1 sweep, whose running sum is one corpus-wide
    * unpartitioned window (exactly the shape WindowSweep exists to
    * kill): sessions cut at the [[eSessions]] 30-min gap contract
    * reduce to [t₀, t₁] intervals, and each interval range-joins the
    * CALENDAR-BOUNDED broadcast hour list it overlaps — per-hour
    * active counts are then one groupBy. Hour membership is closed on
    * both ends (a session touching an hour counts in it). Top-20
    * busiest hours, ties to the earlier hour. Scale shape: one
    * user-partitioned session pass (bounded per key), a ≤ calendar·24
    * broadcast, no global window, no corpus pair. */
  protected def eConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val sess = graft.operators.Sessionize.assign(
        t(spark, dir, "events"), "user_id", "ts", "event_id", gapNs)
      .groupBy("user_id", "session_id")
      .agg(expr(s"min(ts) div $hourNs").as("h0"),
        expr(s"max(ts) div $hourNs").as("h1"))
    val hours = sess.agg(min("h0").as("lo"), max("h1").as("hi"))
      .select(explode(expr("sequence(lo, hi)")).as("h"))
    sess.join(broadcast(hours),
        col("h0") <= col("h") && col("h") <= col("h1"))
      .groupBy("h")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("h0") === col("h"), 1L).otherwise(0L))
          .as("n_starting"))
      .select(expr("h div 24").as("day"), (col("h") % 24).as("hour_of_day"),
        col("h").as("hour_idx"), col("n_active"), col("n_starting"))
      .orderBy(col("n_active").desc, col("hour_idx"))
      .limit(20)
  }

  /** Top-10 session PATHS (the clickstream-pattern table a product team
    * reads before funnel design — which exact event sequences actually
    * happen): sessions cut at 30-min event-time gaps (the [[eSessions]]
    * contract), each session's path = its event types joined in
    * (ts, event_id) order, then path-grain counts and the global top-10
    * via the rank-limit rewrite. Path assembly is
    * array_sort(collect_list(struct)) — the struct sorts by (ts,
    * event_id) so the order is data-pinned, never partition-pinned.
    * Scale shape: per-user windows (bounded per key), one path-grain
    * groupBy, TakeOrdered top-10; sessions longer than 40 events
    * truncate to their first 40 (deterministic prefix) so one
    * pathological bot session cannot build an unbounded grouping key. */
  protected def eSessionPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val sess = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("_gap",
        when(col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1L)
          .otherwise(lit(0L)))
      .withColumn("sid", sum(col("_gap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val paths = sess.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        expr("""array_join(transform(slice(array_sort(
            collect_list(struct(ts, event_id, event_type))), 1, 40),
          s -> s.event_type), '>')""").as("path"))
    val byPath = paths.groupBy("path")
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("n_events")).as("n_events"))
    byPath
      .withColumn("rk", row_number().over(Window.orderBy(
        col("n_sessions").desc, col("path"))))
      .filter(col("rk") <= 10)
      .select(col("rk").cast("long").as("rk"), col("path"),
        col("n_sessions"), col("n_users"), col("n_events"))
      .orderBy("rk")
  }

  // ------------------------------------------------------------- Multimodal

  /** JSONB-analogue handling (reference ingestion_logs.details JSONB,
    * init_db.py:149): extract a typed field from a JSON string column and
    * aggregate on it. */
  protected def ePropsJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(pmod(col("k"), lit(10)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("k_bucket")

  // --------------------------------------- Store-backed end-to-end queries

  /** Window functions as first-class surface (§2.9 — net-new vs the
    * reference): per-customer running order total in date order. Decimal
    * cumulative sum (exact, order-pinned by unique tiebreak). */
  protected def wRunningTotal(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** The stream-stream band join's SEMANTICS run in batch mode against a
    * DuckDB oracle (the streaming path itself is spec-verified for
    * stream==batch equality, so this closes the loop: oracle → batch →
    * stream). Views correlated to clicks by the same user within 1 hour. */
  protected def eBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events").filter(col("user_id") < 50)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    graft.streaming.EventStream.bandJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"),
        band = "1 hour")
      .orderBy("user_id", "l_event_id", "r_event_id")
  }

  /** Window-function suite: per-user event ordering with lag delta and a
    * 3-row moving average — one shuffle computes all three windows. */
  protected def wLagMovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wMa = w.rowsBetween(-2, 0)
    t(spark, dir, "events").filter(col("user_id") < 10)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(w).cast("long").as("rn"),
        (floor((col("value") - coalesce(lag(col("value"), 1).over(w),
          lit(0.0))) * 1e4 + 0.5) / 1e4).as("delta"),
        // Decimal window sum (order-independent) / exact count, rounded:
        // a raw double moving AVG can associate differently per engine.
        (floor(sum(col("value").cast(DecimalType(20, 4))).over(wMa)
          .cast("double") / count(lit(1)).over(wMa) * 1e4 + 0.5) / 1e4).as("ma3"))
      .orderBy("user_id", "rn")
  }

  /** Behavioral funnel: per-user ordered conversion signup → click →
    * purchase by event time; stage counts over the user base. */
  protected def eFunnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val firstTs = e.groupBy("user_id")
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    firstTs.agg(
      count(lit(1)).as("n_users"),
      sum(when(col("t_signup").isNotNull, 1L).otherwise(0L)).as("n_signup"),
      sum(when(col("t_signup").isNotNull && col("t_click") > col("t_signup"),
        1L).otherwise(0L)).as("n_click_after_signup"),
      sum(when(col("t_signup").isNotNull && col("t_click") > col("t_signup") &&
        col("t_purchase") > col("t_click"), 1L).otherwise(0L))
        .as("n_full_funnel"))
  }

  /** Time-WINDOWED funnel (the ClickHouse `windowFunnel` shape —
    * [[eFunnelConversion]] without the window is the "ever converted"
    * lie: a purchase 2 years after signup is not a funnel): steps
    * signup → click → purchase where each step must land strictly
    * after the previous step and within 7 days of it, anchored at the
    * user's FIRST signup and then the EARLIEST qualifying event per
    * step (first-anchor semantics — deterministic and engine-replayable
    * with plain conditional window minima, no fold state). Per user the
    * reached level is 0..3; output is the level histogram with corpus
    * shares. Scale shape: one shuffle by user, three whole-partition
    * window projections sharing the same partitioning (no orderBy, no
    * sort), then a 4-row groupBy. */
  protected def eWindowFunnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val winNs = 7L * 86400 * 1000 * 1000 * 1000
    val w = Window.partitionBy("user_id")
    val base = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = base.withColumn("t1",
      min(when(col("event_type") === "signup", col("ts"))).over(w))
    val s2 = s1.withColumn("t2",
      min(when(col("event_type") === "click" && col("ts") > col("t1")
        && col("ts") <= col("t1") + winNs, col("ts"))).over(w))
    val s3 = s2.withColumn("t3",
      min(when(col("event_type") === "purchase" && col("ts") > col("t2")
        && col("ts") <= col("t2") + winNs, col("ts"))).over(w))
    val lv = s3.groupBy("user_id")
      .agg(max(when(col("t3").isNotNull, 3L)
        .when(col("t2").isNotNull, 2L)
        .when(col("t1").isNotNull, 1L).otherwise(0L)).as("level"))
    // Total via a global window over the ≤4-row histogram (bounded by
    // construction), NOT a crossJoin(broadcast(hist.agg)) — that form
    // re-executes the whole window chain for the broadcast side.
    val hist = lv.groupBy("level").agg(count(lit(1)).as("n_users"))
    hist
      .withColumn("tot", sum(col("n_users")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .select(col("level"), col("n_users"),
        expr("n_users * 10000 div tot").as("share_bp"))
      .orderBy("level")
  }

  /** The ranking-window suite (rank / dense_rank / percent_rank /
    * cume_dist / ntile) in one pass per status partition — one shuffle,
    * one in-partition sort shared by all five functions. The (price,
    * orderkey) tie-break makes every output, ntile included, a total
    * function of the data. */
  protected def wRankSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(97)) === 0)
      .select(col("o_orderstatus"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        (floor(percent_rank().over(w) * 1000000 + 0.5) / 1000000).as("prank"),
        (floor(cume_dist().over(w) * 1000000 + 0.5) / 1000000).as("cdist"),
        ntile(4).over(w).cast("long").as("tile"))
      .orderBy("o_orderstatus", "rnk")
  }

  /** Weekly cohort retention matrix over the event stream: users cohorted
    * by first-seen week, per-(cohort, weeks-since) distinct-active counts
    * with the retention fraction against the cohort size. Shape: the first-
    * seen aggregation and the activity join both hash-partition by user_id
    * (the join reuses the aggregation's partitioning — no extra exchange),
    * then one shuffle by (cohort, week); cohort sizes are a weeks-sized
    * relation broadcast back. The canonical product-analytics report, and
    * at 100 TB the shape survives because nothing ever materializes wider
    * than (users × their active weeks). */
  protected def eRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekNs = 7L * 24 * 3600 * 1000 * 1000 * 1000
    val e = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $weekNs").as("wk"))
    val first = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    val active = e.join(first, Seq("user_id"))
      .select(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_since"),
        col("user_id"))
      .distinct()
    val cohortSizes = first.groupBy("cohort_wk")
      .agg(count(lit(1)).as("cohort_n"))
    active.groupBy("cohort_wk", "wk_since")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(cohortSizes), Seq("cohort_wk"))
      .select(col("cohort_wk"), col("wk_since"), col("n_active"),
        (floor(col("n_active") * 10000.0 / col("cohort_n") + 0.5) / 10000)
          .as("retention"))
      .orderBy("cohort_wk", "wk_since")
  }

  /** Trailing-window anomaly detection on daily event volumes: per type,
    * each day's count is z-scored against the previous 10 observed days,
    * and the 5 most anomalous (type, day) cells surface with the |z| ≥ 3
    * verdict in-row — the volume-spike monitor a pipeline runs on its
    * ingest feeds. Determinism: the trailing stats are EXACT integer
    * (n, Σ, Σ²) frame sums — Σ² in DECIMAL(38,0)/HUGEINT (a Long cnt²
    * wraps silently from ~3·10⁹ events per day-cell, inside a 100 TB
    * feed's envelope) — and mean/variance/z derive from them in one
    * fixed double-arithmetic order (the Σ·Σ square runs in DOUBLE on
    * BOTH engines, IEEE-identical at any magnitude), z floored to 4 dp.
    *
    * Scale shape: the event stream collapses to (type, day) bins in one
    * shuffle; the trailing window runs over that bounded bins relation
    * partitioned by type — the corpus itself never sees a window. */
  protected def eAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bins = t(spark, dir, "events")
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-10, -1)
    bins
      .withColumn("w_n", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col("cnt")).over(w))
      .withColumn("w_sumsq",
        sum(col("cnt").cast(DecimalType(38, 0)) * col("cnt")).over(w))
      .filter(col("w_n") === 10)
      .withColumn("mean", col("w_sum") / 10.0)
      .withColumn("variance",
        (col("w_sumsq").cast("double")
          - col("w_sum").cast("double") * col("w_sum").cast("double")
            / 10.0) / 10.0)
      .filter(col("variance") > 0)
      .withColumn("z4",
        floor((col("cnt") - col("mean")) / sqrt(col("variance")) * 1e4 + 0.5) / 1e4)
      .select(col("event_type"), col("day"), col("cnt"), col("z4"),
        (abs(col("z4")) >= 3.0).as("is_anomaly"))
      .orderBy(abs(col("z4")).desc, col("event_type"), col("day"))
      .limit(5)
  }

  /** Sliding-window distinct users (10-minute windows hopping every 5)
    * — the overlap-window metric a dashboard wants where tumbling bins
    * jitter; sliding DISTINCT is the one aggregate that cannot pre-agg,
    * so the scale shape is assign-then-dedup: each event fans out to
    * exactly its TWO covering windows, distinct (window, user) pairs,
    * one count per window — fan-out 2×, no window function over the
    * corpus at all. */
  protected def wSlidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val hop = 300000000000L // 5 min
    val ev = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $hop").as("h"))
    ev.select(col("user_id"), explode(array(col("h") - 1, col("h")))
        .as("win"))
      .distinct()
      .groupBy("win").agg(count(lit(1)).as("n_distinct_users"))
      .orderBy("win")
  }

  /** DAU / WAU / MAU activity ratios + stickiness (avg-DAU ÷ avg-MAU,
    * the product-analytics headline every event pipeline reports): the
    * distinct (user, day) pair relation reduces ONCE, then re-coarsens
    * to epoch-week/epoch-month grains (div-7 / div-30 folds of the
    * epoch day — grain arithmetic, no calendar lookups) for the weekly
    * and monthly actives. All ratios are truncating integer divisions
    * of exact sums. Scale shape: the pair distinct is the only
    * corpus-sized shuffle; the three grain aggregates run over the
    * bounded (user, day) relation and combine to one row. */
  /** Growth accounting (the Social-Capital / a16z MAU decomposition —
    * the layer [[eDauWauMau]]'s totals hide: a flat WAU can be healthy
    * retention or a churn-for-new treadmill, and only the
    * new/retained/resurrected/churned split tells you which): weekly
    * active grain (distinct user-week, epoch-week = day div 7), each
    * active (user, week) classified by the user's own timeline — new
    * (first week ever), retained (active the week before), resurrected
    * (gap ≥ 2 weeks); churned is emitted AT week w+1 for users active
    * in w but not w+1 (bounded to the corpus horizon). Net growth =
    * new + resurrected − churned and the quick ratio
    * (new+resurrected)/churned in bp (−1 sentinel when nobody
    * churned). Scale shape: one distinct to user-week grain, per-user
    * lag/lead windows, one groupBy week — the corpus never fans out. */
  protected def eGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weekNs = 7L * 86400 * 1000 * 1000 * 1000
    val w = Window.partitionBy("user_id").orderBy("week")
    val uw = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $weekNs").as("week"))
      .distinct()
    val tl = uw
      .withColumn("prev", lag(col("week"), 1).over(w))
      .withColumn("nxt", lead(col("week"), 1).over(w))
    val maxWeek = broadcast(uw.agg(max(col("week")).as("max_week")))
    val states = tl.select(col("week"),
        when(col("prev").isNull, "new")
          .when(col("prev") === col("week") - 1, "retained")
          .otherwise("resurrected").as("state"))
    val churn = tl.crossJoin(maxWeek)
      .filter((col("nxt").isNull || col("nxt") =!= col("week") + 1)
        && col("week") < col("max_week"))
      .select((col("week") + 1).as("week"), lit("churned").as("state"))
    states.unionByName(churn)
      .groupBy("week")
      .pivot("state", Seq("new", "retained", "resurrected", "churned"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("week"), col("new").as("n_new"),
        col("retained").as("n_retained"),
        col("resurrected").as("n_resurrected"),
        col("churned").as("n_churned"),
        (col("new") + col("resurrected") - col("churned")).as("net_growth"),
        expr("""CASE WHEN churned = 0 THEN CAST(-1 AS BIGINT)
            ELSE (new + resurrected) * 10000 div churned END""")
          .as("quick_ratio_bp"))
      .orderBy("week")
  }

  protected def eDauWauMau(spark: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ud = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .distinct()
      .localCheckpoint(true) // three grain consumers
    val dau = ud.groupBy("day").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_days"), sum("c").as("sum_dau"))
    val wau = ud.select(col("user_id"), expr("day div 7").as("wk"))
      .distinct().groupBy("wk").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_weeks"), sum("c").as("sum_wau"))
    val mau = ud.select(col("user_id"), expr("day div 30").as("mo"))
      .distinct().groupBy("mo").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_months"), sum("c").as("sum_mau"))
    dau.crossJoin(wau).crossJoin(mau)
      .select(col("n_days"), expr("sum_dau div n_days").as("avg_dau"),
        col("n_weeks"), expr("sum_wau div n_weeks").as("avg_wau"),
        col("n_months"), expr("sum_mau div n_months").as("avg_mau"),
        expr("(sum_dau div n_days) * 10000 div (sum_mau div n_months)")
          .as("stickiness4"))
  }

  /** Burstiness index of inter-event gaps (Goh & Barabási 2008,
    * B = (σ−μ)/(σ+μ) per user: −1 metronome, 0 Poisson, →1 bursty) —
    * the temporal-pattern diagnostic that separates bots (periodic)
    * from humans (bursty) and calibrates session-gap thresholds.
    * Exactness: gaps are integer nanoseconds from the same ordered lag
    * as the transition family; B reduces to
    * (√(n·Σg²−(Σg)²) − Σg) / (√(n·Σg²−(Σg)²) + Σg) — moments exact in
    * DECIMAL(38,0), ONE sqrt per user, 4 dp floor. */
  protected def eBurstiness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = t(spark, dir, "events")
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("user_id"), (col("ts") - col("prev")).as("g"))
    val s2n = col("n").cast(dec) * col("sg2") - col("sg") * col("sg")
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("g").cast(dec)).as("sg"),
        sum(col("g").cast(dec) * col("g")).as("sg2"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n").as("n_gaps"),
        expr("sg div n").as("mean_gap_ns"),
        (floor((sqrt(s2n.cast("double")) - col("sg").cast("double"))
          / (sqrt(s2n.cast("double")) + col("sg").cast("double"))
          * 1e4) / 1e4).as("b4"))
      .orderBy("user_id")
  }

  /** Interval-union coverage — each event opens a 5-minute activity
    * window; how much wall-clock does each user actually cover once
    * overlaps merge? The classic sweep-line union (billable-time /
    * uptime / exposure dedup) as pure windows: islands form where a
    * start exceeds the running max of prior ends (the mask_spans
    * edge-detect generalized to arbitrary intervals), island bounds are
    * one groupBy. All integer nanoseconds; per-user windows only. */
  protected def wIntervalUnion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val span = 300000000000L // 5 min in ns
    val iv = t(spark, dir, "events")
      .filter(col("user_id") < 40)
      .select(col("user_id"), col("ts").as("s"),
        (col("ts") + span).as("e"))
    val wPrev = Window.partitionBy("user_id").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, -1)
    val isl = iv
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("new_isl",
        when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("isl", sum(col("new_isl")).over(
        Window.partitionBy("user_id").orderBy("s", "e")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy("user_id", "isl")
      .agg(min(col("s")).as("s0"), max(col("e")).as("e1"),
        count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(sum(col("n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("e1") - col("s0")).as("covered_ns"))
      .orderBy("user_id")
  }

  /** Pareto concentration point — the smallest user cohort carrying 80%
    * of event volume (the "80/20" capacity/abuse-planning number; pairs
    * with [[statsGini]]'s scalar inequality). FULLY integer: the 80%
    * test clears to 5·cum ≥ 4·N. The descending global rank AND the
    * running event total both avoid corpus-wide windows: rows range-
    * shard by the count's high bits (c div 64), within-bucket
    * row_number/running-sum compose with per-bucket prefix offsets over
    * the bounded bucket relation — the Gini two-pass pattern with a
    * second (sum) prefix layer. */
  protected def ePowerUsers(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .withColumn("bk", expr("c div 64"))
    val wOff = Window.orderBy(col("bk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bks = u.groupBy("bk")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .withColumn("offn", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .withColumn("offs", coalesce(sum(col("s")).over(wOff), lit(0L)))
    val wIn = Window.partitionBy("bk")
      .orderBy(col("c").desc, col("user_id"))
    val ranked = u
      .withColumn("ri", row_number().over(wIn))
      .withColumn("cumin", sum(col("c")).over(
        wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(bks.select("bk", "offn", "offs"), Seq("bk"))
      .select((col("offn") + col("ri")).as("r"),
        (col("offs") + col("cumin")).as("cum"))
    val tot = u.agg(count(lit(1)).as("nu"), sum(col("c")).as("ne"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("cum") * 5 >= col("ne") * 4)
      .agg(min(col("r")).as("users_for_80pct"))
      .crossJoin(broadcast(tot))
      .select(col("nu").as("n_users"), col("ne").cast("long").as("n_events"),
        col("users_for_80pct"),
        expr("(users_for_80pct * 1000000) div nu").as("user_share_micro"))
  }

  /** Gaps-and-islands consecutive-day activity streaks — the canonical
    * SQL pattern ([[eSessions]]'s discrete-grain sibling: sessions split
    * on elapsed time, streaks split on missing CALENDAR days): the
    * distinct (user, day) relation islands by the day − row_number()
    * constant-group trick, then reduces to a streak-length histogram
    * (engagement/retention's "current streak" backbone). All integers;
    * windows are per-user only (no corpus-wide ordering); the distinct
    * is the single corpus-sized shuffle and the histogram runs over the
    * ≤|days|-bounded island relation. */
  protected def wGapIslands(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ud = t(spark, dir, "events")
      .select(col("user_id"), expr(s"ts div $dayNs").as("day"))
      .distinct()
    ud.withColumn("grp", col("day") - row_number().over(
        Window.partitionBy("user_id").orderBy("day")))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("len")
      .agg(count(lit(1)).as("n_islands"),
        countDistinct("user_id").as("n_users"))
      .select(col("len").as("streak_days"), col("n_islands"),
        col("n_users"))
      .orderBy("streak_days")
  }

  /** Cochran–Armitage trend test (Cochran 1954; Armitage 1955) —
    * "does conversion rise MONOTONICALLY with activity?", the ordered
    * sibling of the 2×2 χ² ([[eExpTwoProp]] asks *different*, this asks
    * *trending*): users bucket into the ordinal activity scores 0..4
    * (w = min(⌊events/20⌋, 4) — spread so sf-scale corpora populate
    * several buckets), conversion =
    * ≥1 purchase, and the 1-df trend statistic in cleared integer form
    * Z²·10⁶ = N·(N·Σwr − R·Σwn)²·10⁶ div (R·(N−R)·(N·Σw²n − (Σwn)²)),
    * flagged at the exact χ²₀.₀₅,₁ cut (≥ 3.841459·10⁶). Everything is
    * DECIMAL(38,0)/HUGEINT; the numerator N·(N·Σwr−R·Σwn)²·10⁶ is
    * bounded by the PROVEN envelope |N·Σwr−R·Σwn| = 4R(N−R) ≤ N²
    * (max at R=N/2, all converters in bucket 4), i.e. ≤ N⁵·10⁶, which
    * crosses the 38-digit cap at N ≈ 2.51·10⁶ — so the LOUD sentinel
    * binds at N > 2·10⁶ (worst case 3.2·10³⁷ < 10³⁸, emitted
    * identically on both engines; the silent NULL-overflow mode the
    * r15 review flagged at the old 3·10⁶ guard cannot occur). R = 0,
    * R = N, or zero score variance read sentinel −1 (trend undefined).
    * Scale shape: one user-keyed aggregate, a ≤5-row bucket table,
    * a 1-row moment reduce broadcast back onto the buckets. */
  protected def eExpTrend(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val per = t(spark, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("buys"))
      .select(
        expr("least(n_ev div 20, 4)").cast("long").as("w"),
        when(col("buys") > 0, 1L).otherwise(0L).as("conv"))
    val buckets = per.groupBy("w")
      .agg(count(lit(1)).as("n"), sum("conv").as("r"))
      .select(col("w"), col("n"), col("r"),
        expr("r * 1000000 div n").as("rate6"))
    val m = buckets.agg(
      sum(col("n").cast(dec)).as("nn"),
      sum(col("r").cast(dec)).as("rr"),
      sum(col("w").cast(dec) * col("r")).as("swr"),
      sum(col("w").cast(dec) * col("n")).as("swn"),
      sum(col("w").cast(dec) * col("w") * col("n")).as("sw2n"))
      .select(
        expr("CAST(nn AS BIGINT)").as("n_users"),
        expr("CAST(rr AS BIGINT)").as("n_conv"),
        expr("""CAST(CASE
            WHEN rr = 0 OR rr = nn
              OR nn * sw2n - swn * swn = 0 THEN -1
            WHEN nn > 2000000 THEN -2
            ELSE (nn * (nn * swr - rr * swn) * (nn * swr - rr * swn)
                  * 1000000)
                 div (rr * (nn - rr) * (nn * sw2n - swn * swn))
            END AS BIGINT)""").as("z2_6"))
      .withColumn("trend_sig",
        expr("CASE WHEN z2_6 >= 3841459 THEN 1 ELSE 0 END").cast("long"))
    buckets.crossJoin(broadcast(m)).orderBy("w")
  }

  /** Sample-ratio-mismatch audit across 8 synthetic assignment layers —
    * the first gate any experimentation platform runs before reading a
    * metric (Fabijan et al. 2019, "Diagnosing SRM"): each layer hashes
    * every distinct user into two arms (md5-space, so assignment replays
    * in any engine), and the 1-df Pearson χ² against the 50/50 design
    * collapses to (a−b)²/n — FULLY integer at 10⁻⁶ scale, flagged at
    * the exact χ²₀.₀₅,₁ = 3.841459 threshold cleared of its division
    * ((a−b)²·10⁶ ≥ 3841459·n). Scale shape: ONE distinct over users
    * (the only corpus-sized shuffle), an 8-way explode, one 8-group
    * aggregate — assignment is row-local hashing, never a join. */
  protected def eExpSrm(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events").select(col("user_id")).distinct()
    users
      .select(col("user_id"),
        explode(expr("sequence(0L, 7L)")).as("layer"))
      .select(col("layer"),
        (conv(substring(md5(concat_ws("|", col("layer"), col("user_id"))),
          1, 8), 16, 10).cast("long") % 2).as("arm"))
      .groupBy("layer")
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_arm0"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_arm1"))
      .select(col("layer"), col("n_arm0"), col("n_arm1"),
        expr("(n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000000" +
          " div (n_arm0 + n_arm1)").as("chi2_6"),
        when(expr("(n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000000" +
            " >= 3841459 * (n_arm0 + n_arm1)"), 1L).otherwise(0L)
          .as("srm_flag"))
      .orderBy("layer")
  }

  /** Two-proportion conversion test between the layer-0 md5 arms — the
    * read-out that pairs with [[eExpSrm]]'s design check: conversion =
    * "user has ≥ 1 purchase event", and the 2×2 Pearson χ² is the
    * margin-cleared exact form (ad−bc)²·n / (r₁r₂c₁c₂), DECIMAL(38,0)
    * throughout ((ad−bc)²·n·10⁶ tops ~10³⁶ at million-user scale —
    * inside 38 digits / HUGEINT), ONE truncating division at 10⁻⁶
    * scale. A/A by construction (assignment is independent of
    * behavior), so the expected read is "not significant" — which is
    * exactly what the threshold column audits. Scale shape: two
    * user-keyed distincts + a left-semi-shaped join, one global
    * 4-cell aggregate; no window, no corpus pair. */
  protected def eExpTwoProp(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val users = ev.select(col("user_id")).distinct()
    val converted = ev.filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().withColumn("conv", lit(1L))
    val cells = users.join(converted, Seq("user_id"), "left")
      .select((conv(substring(md5(concat_ws("|", lit(0L), col("user_id"))),
          1, 8), 16, 10).cast("long") % 2).as("arm"),
        coalesce(col("conv"), lit(0L)).as("conv"))
      .agg(
        sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L))
          .cast(DecimalType(38, 0)).as("a"),
        sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L))
          .cast(DecimalType(38, 0)).as("b"),
        sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L))
          .cast(DecimalType(38, 0)).as("c"),
        sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L))
          .cast(DecimalType(38, 0)).as("d"))
    cells.select(
      expr("CAST(a + b AS BIGINT)").as("n_arm0"),
      expr("CAST(c + d AS BIGINT)").as("n_arm1"),
      expr("CAST(a AS BIGINT)").as("conv0"),
      expr("CAST(c AS BIGINT)").as("conv1"),
      expr("CASE WHEN a + b = 0 THEN 0 ELSE a * 1000000 div (a + b) END")
        .as("rate0_6"),
      expr("CASE WHEN c + d = 0 THEN 0 ELSE c * 1000000 div (c + d) END")
        .as("rate1_6"),
      expr("""CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
              ELSE (a * d - b * c) * (a * d - b * c)
                * (a + b + c + d) * 1000000
                div ((a + b) * (c + d) * (a + c) * (b + d)) END""")
        .as("chi2_6"),
      expr("""CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
              WHEN (a * d - b * c) * (a * d - b * c)
                * (a + b + c + d) * 1000000
                >= 3841459 * ((a + b) * (c + d) * (a + c) * (b + d))
              THEN 1 ELSE 0 END""").cast("long").as("sig_flag"))
  }

  /** MATCH_RECOGNIZE-style journey pattern matching — the
    * complex-event-processing feature SQL:2016 standardized and Spark
    * lacks natively: each user's event sequence folds to an
    * initial-letter string (c/e/p/s/v, ordered by (ts, event_id),
    * capped at 1024 events BY CONTRACT so per-user state is bounded at
    * any corpus size), and patterns run as regexes — 'vp' adjacency,
    * 'v[ce]*p' (view reaches purchase through clicks/errors only), and
    * 'ee+' error bursts. Counts are non-overlapping leftmost matches
    * (regexp_count / regexp_extract_all agree on these patterns).
    * Scale shape: ONE user-keyed aggregate builds the strings; the
    * regex pass is row-local; output is 3 rows via stack. */
  protected def ePatternMatch(spark: SparkSession, dir: String): DataFrame = {
    val j = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini"))
      .groupBy("user_id")
      .agg(concat_ws("", slice(expr(
        "transform(sort_array(collect_list(struct(ts, event_id, ini)))," +
          " x -> x.ini)"), 1, 1024)).as("s"))
    j.select(
        expr("regexp_count(s, 'vp')").as("m1"),
        expr("regexp_count(s, 'v[ce]*p')").as("m2"),
        expr("regexp_count(s, 'ee+')").as("m3"))
      .agg(
        sum(when(col("m1") > 0, 1L).otherwise(0L)).as("u1"),
        sum(col("m1")).as("c1"),
        sum(when(col("m2") > 0, 1L).otherwise(0L)).as("u2"),
        sum(col("m2")).as("c2"),
        sum(when(col("m3") > 0, 1L).otherwise(0L)).as("u3"),
        sum(col("m3")).as("c3"))
      .selectExpr("""stack(3,
          'adjacent_view_purchase', u1, CAST(c1 AS BIGINT),
          'view_reaches_purchase', u2, CAST(c2 AS BIGINT),
          'error_burst', u3, CAST(c3 AS BIGINT))
        AS (pattern, n_users, n_matches)""")
      .orderBy("pattern")
  }

  /** Markov removal-effect attribution (Anderl et al. 2016, the
    * data-driven alternative to [[eAttribution]]'s positional rules):
    * journeys are per-user event sequences cut at the FIRST purchase
    * (START → channels → CONV, non-converters → END), the first-order
    * chain's 12-step absorption probability v(START) is the conversion
    * propensity, and each channel's credit is the removal effect — how
    * much v(START) drops when that channel is forced to a dead state.
    * EVERYTHING is the integer micro-unit lattice of
    * [[eMarkovStationary]]: p₆ cells by truncating division, per-term
    * p₆·v₆ div 10⁶ flooring inside each DP step, so the generated
    * oracle (12 unrolled steps × (full + 4 removal variants)) replays
    * bit-for-bit. The transition matrix is |types|²-bounded, so the
    * driver fold is a KB-scale collect — the corpus never leaves the
    * cluster (one window pass + one groupBy). Oracle contract: removal
    * variants are generated for the canonical channel universe
    * (click/error/signup/view); the final semi-join keeps only
    * channels present in the data. */
  protected def eMarkovAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint(true)
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("rn")).as("pr"))
    val kept = ev.join(firstP, Seq("user_id"), "left")
      .filter(col("pr").isNull || col("rn") <= col("pr"))
      .localCheckpoint(true)
    val steps = kept
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .select(coalesce(col("prev"), lit("START")).as("f"),
        when(col("event_type") === "purchase", "CONV")
          .otherwise(col("event_type")).as("t2"))
    val ends = kept.filter(col("pr").isNull)
      .withColumn("mx", max(col("rn")).over(
        Window.partitionBy("user_id")))
      .filter(col("rn") === col("mx"))
      .select(col("event_type").as("f"), lit("END").as("t2"))
    val cells = steps.unionByName(ends)
      .groupBy("f", "t2").agg(count(lit(1)).as("n"))
      .withColumn("rt", sum(col("n")).over(Window.partitionBy("f")))
      .select(col("f"), col("t2"), expr("n * 1000000 div rt").as("p6"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = t(spark, dir, "events")
      .select(col("event_type")).distinct()
      .filter(col("event_type") =!= "purchase")
      .orderBy("event_type").collect().map(_.getString(0))
    // The generated oracle unrolls one removal variant per CANONICAL
    // channel; a dataset with an extra non-purchase event_type would make
    // this query emit a channel the oracle never modeled (and shift the
    // share_bp denominator). Enforce the contract instead of assuming it.
    val extra = channels.toSet -- markovCanonicalChannels
    require(extra.isEmpty,
      s"markov attribution: observed channels ${extra.mkString(",")} are " +
        s"outside the canonical universe " +
        s"${markovCanonicalChannels.mkString("{", ",", "}")} the oracle " +
        "unrolls removal variants for - extend markovCanonicalChannels")
    if (channels.isEmpty || cells.isEmpty)
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("channel", "p_full6", "p_removed6", "removal6", "share_bp")
    val transient = cells.map(_._1).distinct
    def absorb(dead: Option[String]): Long = {
      var v = Map("CONV" -> 1000000L, "END" -> 0L) ++
        transient.map(_ -> 0L).toMap ++ dead.map(_ -> 0L).toMap
      for (_ <- 1 to 12) {
        val next = scala.collection.mutable.Map(transient.map(_ -> 0L): _*)
        cells.foreach { case (f, t2, p6) =>
          val vt = if (dead.contains(t2)) 0L else v.getOrElse(t2, 0L)
          next(f) += p6 * vt / 1000000L
        }
        v = Map("CONV" -> 1000000L, "END" -> 0L) ++ next.toMap
        dead.foreach(d => v += d -> 0L)
      }
      v.getOrElse("START", 0L)
    }
    val pFull = absorb(None)
    val rows = channels.map { c =>
      val pc = absorb(Some(c))
      (c, pFull, pc, pFull - pc)
    }
    val sr = rows.map(_._4).sum
    rows.map { case (c, pf, pc, re) =>
      (c, pf, pc, re, if (sr == 0) 0L else re * 10000L / sr)
    }.toSeq
      .toDF("channel", "p_full6", "p_removed6", "removal6", "share_bp")
      .orderBy("channel")
  }

  /** The canonical non-purchase channel universe the attribution oracle
    * unrolls removal variants for; [[eMarkovAttribution]] REQUIRES the
    * observed channels to be a subset (the contract is enforced, not
    * assumed — an unexpected event_type fails loudly). */
  protected val markovCanonicalChannels: Seq[String] =
    Seq("click", "error", "signup", "view")

  /** Generated DuckDB replay for [[eMarkovAttribution]]: journeys,
    * micro-unit cells, then `steps` unrolled DP iterations for the
    * full chain plus one removal variant per canonical channel (reads
    * of a dead channel's value are CASE'd to zero — the exact driver
    * fold). The final semi-join keeps only channels present. */
  protected def markovAttributionOracle(steps: Int,
                                        removalChannels: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append("""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
        event_type,
        row_number() OVER (PARTITION BY user_id
          ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events),
    fp AS (SELECT user_id, min(rn) AS pr FROM ev
      WHERE event_type = 'purchase' GROUP BY 1),
    kept AS (SELECT ev.*, fp.pr FROM ev LEFT JOIN fp USING (user_id)
      WHERE fp.pr IS NULL OR ev.rn <= fp.pr),
    steps AS (SELECT coalesce(lag(event_type) OVER (PARTITION BY user_id
          ORDER BY tsn, event_id), 'START') AS f,
        CASE WHEN event_type = 'purchase' THEN 'CONV'
             ELSE event_type END AS t2
      FROM kept),
    ends AS (SELECT event_type AS f, 'END' AS t2 FROM (
        SELECT *, max(rn) OVER (PARTITION BY user_id) AS mx
        FROM kept WHERE pr IS NULL)
      WHERE rn = mx),
    tr AS (SELECT f, t2, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT * FROM steps UNION ALL SELECT * FROM ends) GROUP BY 1, 2),
    cells AS MATERIALIZED (SELECT f, t2,
        n * 1000000 // (sum(n) OVER (PARTITION BY f)) AS p6 FROM tr)""")
    val variants = ("full", None) +:
      removalChannels.map(c => (c.replaceAll("[^a-z0-9]", "_"), Some(c)))
    for ((tag, dead) <- variants) {
      val vread = dead match {
        case Some(c) => s"CASE WHEN v.state = '$c' THEN 0 ELSE v.v6 END"
        case None    => "v.v6"
      }
      sb.append(s""",
      v_${tag}_0 AS (SELECT 'CONV' AS state, CAST(1000000 AS BIGINT) AS v6
        UNION ALL SELECT 'END', CAST(0 AS BIGINT)
        UNION ALL SELECT DISTINCT f, CAST(0 AS BIGINT) FROM cells)""")
      for (k <- 1 to steps) {
        sb.append(s""",
        v_${tag}_$k AS (
          SELECT c.f AS state,
            CAST(sum(c.p6 * ($vread) // 1000000) AS BIGINT) AS v6
          FROM cells c JOIN v_${tag}_${k - 1} v ON c.t2 = v.state
          GROUP BY c.f
          UNION ALL SELECT 'CONV', CAST(1000000 AS BIGINT)
          UNION ALL SELECT 'END', CAST(0 AS BIGINT))""")
      }
    }
    val resRows = removalChannels.map { c =>
      val tag = c.replaceAll("[^a-z0-9]", "_")
      s"""SELECT '$c' AS channel, (SELECT v6 FROM v_${tag}_$steps
          WHERE state = 'START') AS p_removed6"""
    }.mkString(" UNION ALL ")
    sb.append(s""",
    chs AS (SELECT DISTINCT event_type AS channel FROM events
      WHERE event_type <> 'purchase'),
    fullv AS (SELECT v6 AS p_full6 FROM v_full_$steps WHERE state = 'START'),
    res AS ($resRows),
    j AS (SELECT chs.channel, fullv.p_full6,
        coalesce(res.p_removed6, 0) AS p_removed6,
        fullv.p_full6 - coalesce(res.p_removed6, 0) AS removal6
      FROM chs JOIN res USING (channel) CROSS JOIN fullv),
    tot AS (SELECT CAST(sum(removal6) AS BIGINT) AS sr FROM j)
    SELECT channel, p_full6, p_removed6, removal6,
      CASE WHEN sr = 0 THEN CAST(0 AS BIGINT)
           ELSE removal6 * 10000 // sr END AS share_bp
    FROM j, tot ORDER BY channel""")
    sb.toString
  }

  /** Exact Shapley-value attribution over pre-purchase channel PRESENCE
    * sets (Shapley 1953; the order-free "simplified Shapley" MTA of
    * Dalessandro et al. 2012 / Shao & Li 2011 — the cooperative-game
    * counterpart to [[eMarkovAttribution]]'s chain model): each
    * converting user contributes their set T of distinct channels
    * touched strictly before the FIRST purchase; the characteristic
    * function v(S) counts converters whose T is a nonempty subset of
    * coalition S, and each channel's credit is its exact Shapley value
    * φ(c) = Σ_{S∌c} |S|!·(n−|S|−1)!/n! · (v(S∪{c}) − v(S)) over the
    * canonical 4-channel universe. Scaled by n! = 24 so φ24 is exact
    * integer (|T| ∈ 1..4 divides 24); absent channels are null players,
    * which by the Shapley null-player axiom contribute 0 and shift
    * nobody else — so the fixed canonical universe is safe whatever
    * subset the data contains. Scale shape: one per-user window + one
    * distinct + one groupBy reduce the corpus to ≤16 coalition-mask
    * counts; the Shapley fold is a KB-scale driver computation over
    * that lattice (the [[eMarkovAttribution]] precedent), and the
    * oracle replays v(S) and all 32 weighted marginals bit-for-bit. */
  protected def eShapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val chans = markovCanonicalChannels // sorted; bit i = chans(i)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint(true)
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("rn")).as("pr"))
    val pre = ev.join(firstP, Seq("user_id"))
      .filter(col("rn") < col("pr"))
      .select(col("user_id"), col("event_type")).distinct()
    val observedPre = pre.select(col("event_type")).distinct()
      .orderBy("event_type").collect().map(_.getString(0))
    val extra = observedPre.toSet -- chans
    require(extra.isEmpty,
      s"shapley attribution: observed pre-purchase channels " +
        s"${extra.mkString(",")} are outside the canonical universe " +
        s"${chans.mkString("{", ",", "}")} the coalition lattice is " +
        "built over - extend markovCanonicalChannels")
    val bitExpr = chans.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (c, i)) =>
        when(col("event_type") === c, lit(1L << i)).otherwise(acc)
    }
    val cnt = pre.withColumn("b", bitExpr)
      .groupBy("user_id").agg(sum(col("b")).as("m"))
      .groupBy("m").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val full = (1 << chans.size) - 1
    def v(s: Int): Long =
      cnt.collect { case (m, c) if m != 0 && (m & ~s & full) == 0 => c }.sum
    // |S|! * (n-1-|S|)! derived from the actual channel-universe size —
    // the same derivation shapleyAttributionOracle uses — so growing or
    // shrinking markovCanonicalChannels can never silently misweight.
    val nCh = chans.size
    val fact = Array(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L)
    require(nCh >= 1 && nCh < fact.length,
      s"shapley attribution: channel universe size $nCh outside supported " +
        s"1..${fact.length - 1} (the 2^n lattice and n! scaling assume a " +
        "small canonical universe)")
    def wgt(s: Int): Long = fact(s) * fact(nCh - 1 - s)
    val phi = chans.zipWithIndex.map { case (c, i) =>
      val bit = 1 << i
      val s = (0 to full).filter(m => (m & bit) == 0).map { m =>
        wgt(Integer.bitCount(m)) * (v(m | bit) - v(m))
      }.sum
      c -> s
    }.toMap
    val chs = t(spark, dir, "events")
      .select(col("event_type")).distinct()
      .filter(col("event_type") =!= "purchase")
      .orderBy("event_type").collect().map(_.getString(0))
    val sp = chs.map(c => phi.getOrElse(c, 0L)).sum
    chs.map { c =>
      val p = phi.getOrElse(c, 0L)
      (c, p, if (sp == 0) 0L else p * 10000L / sp)
    }.toSeq.toDF("channel", "phi24", "share_bp").orderBy("channel")
  }

  /** Generated DuckDB replay for [[eShapleyAttribution]]: masks, the
    * 16-coalition v(S) lattice by subset join, then the 32 weighted
    * marginals as a generated VALUES relation — the exact driver fold. */
  protected def shapleyAttributionOracle(channels: Seq[String]): String = {
    val n = channels.size
    val full = (1 << n) - 1
    val bitCase = channels.zipWithIndex.map { case (c, i) =>
      s"WHEN '$c' THEN ${1L << i}"
    }.mkString(" ")
    val fact = Array(1L, 1L, 2L, 6L, 24L)
    def wgt(s: Int) = fact(s) * fact(n - 1 - s)
    val terms = for {
      i <- 0 until n
      m <- 0 to full if (m & (1 << i)) == 0
    } yield s"('${channels(i)}', ${m | (1 << i)}, $m, ${wgt(Integer.bitCount(m))})"
    val coals = (0 to full).map(s => s"($s)").mkString(", ")
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type,
        row_number() OVER (PARTITION BY user_id
          ORDER BY epoch_ns(ts), event_id) AS rn
      FROM events),
    fp AS (SELECT user_id, min(rn) AS pr FROM ev
      WHERE event_type = 'purchase' GROUP BY 1),
    pre AS (SELECT DISTINCT ev.user_id, ev.event_type
      FROM ev JOIN fp USING (user_id) WHERE ev.rn < fp.pr),
    masks AS (SELECT user_id,
        CAST(sum(CASE event_type $bitCase END) AS BIGINT) AS m
      FROM pre GROUP BY 1),
    cnt AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM masks GROUP BY 1),
    v AS (SELECT s.s, CAST(coalesce(sum(cnt.c), 0) AS BIGINT) AS v
      FROM (VALUES $coals) s(s)
      LEFT JOIN cnt ON cnt.m <> 0 AND (cnt.m & ($full - s.s)) = 0
      GROUP BY 1),
    phi AS (SELECT t.channel,
        CAST(sum(t.w * (vw.v - vo.v)) AS BIGINT) AS phi24
      FROM (VALUES ${terms.mkString(",\n        ")}) t(channel, sw, so, w)
      JOIN v vw ON vw.s = t.sw JOIN v vo ON vo.s = t.so
      GROUP BY 1),
    chs AS (SELECT DISTINCT event_type AS channel FROM events
      WHERE event_type <> 'purchase'),
    tot AS (SELECT CAST(sum(coalesce(phi.phi24, 0)) AS BIGINT) AS sp
      FROM chs LEFT JOIN phi USING (channel))
    SELECT chs.channel, coalesce(phi.phi24, 0) AS phi24,
      CASE WHEN tot.sp = 0 THEN CAST(0 AS BIGINT)
           ELSE coalesce(phi.phi24, 0) * 10000 // tot.sp END AS share_bp
    FROM chs LEFT JOIN phi USING (channel), tot ORDER BY channel"""
  }

  /** Hour-of-day × day-of-week activity heatmap — the load-shape matrix
    * behind capacity planning and send-time optimization: event counts
    * and per-cell share (frac4 of the whole corpus) on the 7×24 grid.
    * dow uses the epoch-day +4 fold (1970-01-01 was a Thursday; 0 =
    * Sunday), all integer. One groupBy to a 168-row relation. */
  protected def eHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dayNs = 24L * hourNs
    val cells = t(spark, dir, "events")
      .groupBy(expr(s"((ts div $dayNs) + 4) % 7").as("dow"),
        expr(s"(ts div $hourNs) % 24").as("hour"))
      .agg(count(lit(1)).as("n"))
    cells
      .crossJoin(broadcast(cells.agg(sum(col("n")).as("tot"))))
      .select(col("dow"), col("hour"), col("n"),
        expr("n * 10000 div tot").as("frac4"))
      .orderBy("dow", "hour")
  }

  /** Experiment power / sample-size planner (Lehr 1992's n = 16·p(1−p)/δ²
    * per arm at α=0.05, power 0.8) — the pre-experiment companion to
    * [[eExpSrm]]/[[eExpTwoProp]]: for each event type, the baseline rate
    * is the observed share of users emitting it, the MDE is a relative
    * 10% lift (δ = p/10), and the per-arm requirement clears to the
    * FULLY integer ceiling n = ⌈1600·u·(u−c) / c²⌉ = (1600·u·(u−c) +
    * c² − 1) div c² — no z-table float ever materializes. days_to_power
    * divides by the observed distinct-user daily rate, the go/no-go
    * number a platform actually schedules against. Scale shape: one
    * (type, user) distinct + one user distinct; everything after is
    * |types|-bounded. */
  protected def eExpPower(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
    val conv = ev.select(col("event_type"), col("user_id")).distinct()
      .groupBy("event_type").agg(count(lit(1)).as("c"))
    val tot = ev.agg(
      countDistinct("user_id").as("u"),
      (expr(s"max(ts div $dayNs) - min(ts div $dayNs)") + 1).as("n_days"))
    conv.crossJoin(broadcast(tot))
      .select(col("event_type"), col("u").as("n_users"),
        col("c").as("n_converters"),
        expr("c * 1000000 div u").as("rate6"),
        expr("""CASE WHEN c = 0 OR c = u THEN CAST(-1 AS BIGINT)
                ELSE CAST((CAST(1600 AS DECIMAL(38,0)) * u * (u - c)
                     + c * c - 1) div (c * c) AS BIGINT) END""")
          .as("n_per_arm"))
      .withColumn("n_total",
        expr("CASE WHEN n_per_arm < 0 THEN CAST(-1 AS BIGINT)" +
          " ELSE 2 * n_per_arm END"))
      .crossJoin(broadcast(tot.select(col("u").as("u2"),
        col("n_days").as("nd"))))
      .withColumn("days_to_power",
        expr("""CASE WHEN n_total < 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST((CAST(n_total AS DECIMAL(38,0)) * nd + u2 - 1)
                     div u2 AS BIGINT) END"""))
      .select(col("event_type"), col("n_users"), col("n_converters"),
        col("rate6"), col("n_per_arm"), col("n_total"),
        col("days_to_power"))
      .orderBy("event_type")
  }

  /** Continuous-metric power planner — [[eExpPower]]'s companion for
    * revenue-style metrics (Lehr's n = 16·σ²/δ² per arm at a 5%
    * relative MDE): with δ = mean/20 the requirement clears to the
    * FULLY integer ceiling n = ⌈6400·(n·Σx²−(Σx)²) / (Σx)²⌉ — the
    * variance and the squared mean share the n² factor, so no float
    * ever materializes. Per event type over exact per-event cents;
    * cleared moments in DECIMAL(38,0)/HUGEINT. One type-keyed moment
    * aggregate; |types|-bounded after. */
  protected def eExpPowerMeans(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    t(spark, dir, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("cents").cast(dec)).as("sx"),
        sum(col("cents").cast(dec) * col("cents")).as("sxx"))
      .select(col("event_type"), col("n").cast("long").as("n_obs"),
        expr("CAST(sx div n AS BIGINT)").as("mean_cents"),
        expr("""CASE WHEN sx = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST((6400 * (n * sxx - sx * sx) + sx * sx - 1)
                     div (sx * sx) AS BIGINT) END""").as("n_per_arm"))
      .withColumn("n_total",
        expr("CASE WHEN n_per_arm < 0 THEN CAST(-1 AS BIGINT)" +
          " ELSE 2 * n_per_arm END"))
      .orderBy("event_type")
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013) — the
    * pre-experiment covariate adjustment every mature A/B platform
    * applies before the t-test: per user, X = pre-period purchase
    * cents, Y = post-period purchase cents (the period split is the
    * midpoint of the observed day range), θ = cov(X,Y)/var(X), and the
    * achievable variance reduction is ρ² (in basis points). FULLY
    * integer: the cleared moments n·Σxy−ΣxΣy, n·Σx²−(Σx)²,
    * n·Σy²−(Σy)² are exact DECIMAL(38,0); θ₆ is one truncating
    * division with the sign split out (Spark div truncates, DuckDB //
    * floors — abs first, re-sign after); ρ²·10⁴ composes two
    * non-negative truncating divisions so both engines replay it
    * bit-for-bit. Scale shape: one user-keyed aggregate over purchase
    * rows + one distinct-user left join, then a single 6-moment
    * reduce to one row — no window anywhere. */
  protected def eExpCuped(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val per = ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(sum(when(col("day") < col("mid"), col("cents")).otherwise(0L))
          .as("x"),
        sum(when(col("day") >= col("mid"), col("cents")).otherwise(0L))
          .as("y"))
    val xy = ev.select("user_id").distinct()
      .join(per, Seq("user_id"), "left")
      .select(coalesce(col("x"), lit(0L)).cast(dec).as("x"),
        coalesce(col("y"), lit(0L)).cast(dec).as("y"))
    xy.agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n").cast("long").as("n_users"),
        col("sx").cast("long").as("pre_cents"),
        col("sy").cast("long").as("post_cents"),
        expr("""CASE WHEN n * sxx - sx * sx = 0 THEN 0
                WHEN n * sxy - sx * sy < 0
                THEN -((-(n * sxy - sx * sy)) * 1000000
                       div (n * sxx - sx * sx))
                ELSE (n * sxy - sx * sy) * 1000000
                     div (n * sxx - sx * sx) END""").as("theta6"),
        expr("""CASE WHEN n * sxx - sx * sx = 0
                       OR n * syy - sy * sy = 0 THEN 0
                ELSE (abs(n * sxy - sx * sy) * 10000
                       div (n * sxx - sx * sx))
                   * (abs(n * sxy - sx * sy) * 10000
                       div (n * syy - sy * sy)) div 10000 END""")
          .as("var_red_bp"))
  }

  /** Sign-split micro-mean `⌊|s|·10⁶ / n⌋·sign(s)` emitted ONCE for both
    * engines (Spark `div` truncates toward zero, DuckDB `//` floors —
    * dividing the absolute value and re-signing makes both truncate, the
    * house fix from theta6). `s`/`n` are column names already cast wide
    * (DECIMAL(38,0) on Spark, HUGEINT in DuckDB) by the caller. */
  private def signedMean6(s: String, n: String, spark: Boolean): String = {
    val div = if (spark) "div" else "//"
    s"(CASE WHEN $n = 0 THEN 0 WHEN $s >= 0 THEN ($s * 1000000) $div $n " +
      s"ELSE -((-($s) * 1000000) $div $n) END)"
  }

  /** Difference-in-differences over the md5 A/A split — the 2×2 panel
    * contrast behind Card & Krueger 1994 (see Angrist & Pischke 2009
    * §5.2): treatment = deterministic md5 hash of user_id (salt "did",
    * so assignment replays in any engine and is independent of
    * behavior by construction), periods split at the midpoint of the
    * observed day range, outcome = per-user purchase cents per period
    * (non-purchasers are zero-filled — the panel is ALL users), and
    * DiD₆ = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) in micro-cents.
    * A/A by construction, so the expected read is ≈ 0; the query also
    * carries its own falsification column — a placebo DiD inside the
    * pre-period (pre split again at its own midpoint), the standard
    * parallel-trends probe: a pipeline that alarms on did6 but not on
    * placebo_did6 is seeing a real post-period shift, not a trend
    * artifact. FULLY integer: period sums are exact cents, each group
    * mean is one [[signedMean6]] division, and the two contrasts are
    * differences of those integers — bit-identical across engines.
    * Scale shape: one user-keyed aggregate over purchase rows + one
    * distinct-user left join (arm assignment is row-local hashing,
    * never a join), then a single 8-cell global reduce to ONE row —
    * no window, no corpus pair, no collect. */
  protected def eExpDid(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    // Epoch days are non-negative, so div/// agree on both cut points.
    val cuts = ev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("lo"), expr("(lo + hi + 1) div 2").as("mid"))
      .select(expr("(lo + mid + 1) div 2").as("q"), col("mid"))
    val per = ev.filter(col("event_type") === "purchase")
      .crossJoin(broadcast(cuts))
      .groupBy("user_id")
      .agg(
        sum(when(col("day") < col("q"), col("cents")).otherwise(0L))
          .as("pa"),
        sum(when(col("day") >= col("q") && col("day") < col("mid"),
          col("cents")).otherwise(0L)).as("pb"),
        sum(when(col("day") < col("mid"), col("cents")).otherwise(0L))
          .as("pre"),
        sum(when(col("day") >= col("mid"), col("cents")).otherwise(0L))
          .as("post"))
    val panel = ev.select("user_id").distinct()
      .join(per, Seq("user_id"), "left")
      .select(
        (conv(substring(md5(concat_ws("|", lit("did"), col("user_id"))),
          1, 8), 16, 10).cast("long") % 2).as("arm"),
        coalesce(col("pa"), lit(0L)).cast(dec).as("pa"),
        coalesce(col("pb"), lit(0L)).cast(dec).as("pb"),
        coalesce(col("pre"), lit(0L)).cast(dec).as("pre"),
        coalesce(col("post"), lit(0L)).cast(dec).as("post"))
    val zero = lit(0L).cast(dec)
    val cells = panel.agg(
      sum(when(col("arm") === 1, 1L).otherwise(0L)).cast(dec).as("nt"),
      sum(when(col("arm") === 0, 1L).otherwise(0L)).cast(dec).as("nc"),
      sum(when(col("arm") === 1, col("pre")).otherwise(zero)).as("tpre"),
      sum(when(col("arm") === 1, col("post")).otherwise(zero)).as("tpost"),
      sum(when(col("arm") === 0, col("pre")).otherwise(zero)).as("cpre"),
      sum(when(col("arm") === 0, col("post")).otherwise(zero)).as("cpost"),
      sum(when(col("arm") === 1, col("pa")).otherwise(zero)).as("tpa"),
      sum(when(col("arm") === 1, col("pb")).otherwise(zero)).as("tpb"),
      sum(when(col("arm") === 0, col("pa")).otherwise(zero)).as("cpa"),
      sum(when(col("arm") === 0, col("pb")).otherwise(zero)).as("cpb"))
    def m6(s: String, n: String) = signedMean6(s, n, spark = true)
    cells.select(
      expr("CAST(nt AS BIGINT)").as("n_treat"),
      expr("CAST(nc AS BIGINT)").as("n_ctrl"),
      expr(s"CAST(${m6("tpre", "nt")} AS BIGINT)").as("treat_pre_m6"),
      expr(s"CAST(${m6("tpost", "nt")} AS BIGINT)").as("treat_post_m6"),
      expr(s"CAST(${m6("cpre", "nc")} AS BIGINT)").as("ctrl_pre_m6"),
      expr(s"CAST(${m6("cpost", "nc")} AS BIGINT)").as("ctrl_post_m6"),
      expr(s"CAST((${m6("tpost", "nt")} - ${m6("tpre", "nt")})" +
        s" - (${m6("cpost", "nc")} - ${m6("cpre", "nc")}) AS BIGINT)")
        .as("did6"),
      expr(s"CAST((${m6("tpb", "nt")} - ${m6("tpa", "nt")})" +
        s" - (${m6("cpb", "nc")} - ${m6("cpa", "nc")}) AS BIGINT)")
        .as("placebo_did6"))
  }

  /** Sign-split truncating division `⌊|s| / n⌋·sign(s)` emitted ONCE for
    * both engines — [[signedMean6]] without the 10⁶ scale step, for
    * ratios whose numerator is already in micro units. */
  private def signedDiv(s: String, n: String, spark: Boolean): String = {
    val div = if (spark) "div" else "//"
    s"(CASE WHEN $n = 0 THEN 0 WHEN $s >= 0 THEN $s $div $n " +
      s"ELSE -((-($s)) $div $n) END)"
  }

  /** Coarsened exact matching (Iacus, King & Porro 2012) for the SAME
    * md5 "did" experiment as [[eExpDid]] — the matched-strata companion
    * estimator: pre-period covariates (activity bucket over the event
    * count — 0, 1–2, 3–5, 6–10, 11+ — and a prior-buyer flag) are
    * coarsened into ≤ 10 strata; a stratum is MATCHED when both arms
    * are present; the per-stratum read is the treated-vs-control
    * post-period purchase-cents mean gap, and ATT₆ is the
    * treated-count-weighted average of matched-stratum gaps (King &
    * Nielsen 2019's argument for CEM over propensity scores: exact
    * balance inside strata, imbalance only ACROSS pruned strata —
    * which the `matched` column surfaces instead of hiding). A/A by
    * construction, so the expected ATT read is ≈ 0. FULLY integer:
    * covariates are counts, means are [[signedMean6]], the weighted
    * ATT is one [[signedDiv]] over micro units. Scale shape: one
    * user-keyed aggregate (covariates + outcome in a single pass),
    * row-local arm hashing, a ≤10-row strata aggregate, a 1-row ATT
    * reduce broadcast back — no window, no corpus pair, no collect. */
  protected def eExpCem(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val dayNs = 86400L * 1000 * 1000 * 1000
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr(s"ts div $dayNs").as("day"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val mid = ev.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val per = ev.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("day") < col("mid")
          && col("event_type") === "purchase", 1L).otherwise(0L))
          .as("pre_buys"),
        sum(when(col("day") >= col("mid")
          && col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).as("post"))
    val strata = per.select(
      (conv(substring(md5(concat_ws("|", lit("did"), col("user_id"))),
        1, 8), 16, 10).cast("long") % 2).as("arm"),
      expr("""CASE WHEN pre_n = 0 THEN 0 WHEN pre_n <= 2 THEN 1
              WHEN pre_n <= 5 THEN 2 WHEN pre_n <= 10 THEN 3
              ELSE 4 END""").cast("long").as("act_bucket"),
      when(col("pre_buys") > 0, 1L).otherwise(0L).as("pre_buyer"),
      col("post").cast(dec).as("post"))
    val zero = lit(0L).cast(dec)
    val cells = strata.groupBy("act_bucket", "pre_buyer")
      .agg(
        sum(when(col("arm") === 1, 1L).otherwise(0L)).cast(dec).as("nt"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).cast(dec).as("nc"),
        sum(when(col("arm") === 1, col("post")).otherwise(zero))
          .as("tpost"),
        sum(when(col("arm") === 0, col("post")).otherwise(zero))
          .as("cpost"))
    def m6(s: String, n: String) = signedMean6(s, n, spark = true)
    val scored = cells.select(
      col("act_bucket"), col("pre_buyer"),
      expr("CAST(nt AS BIGINT)").as("n_treat"),
      expr("CAST(nc AS BIGINT)").as("n_ctrl"),
      expr(s"CAST(${m6("tpost", "nt")} AS BIGINT)").as("treat_m6"),
      expr(s"CAST(${m6("cpost", "nc")} AS BIGINT)").as("ctrl_m6"),
      expr("CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END").cast("long")
        .as("matched"))
      .withColumn("diff6",
        expr("CASE WHEN matched = 1 THEN treat_m6 - ctrl_m6" +
          " ELSE CAST(0 AS BIGINT) END"))
    val att = scored.filter(col("matched") === 1)
      .agg(coalesce(sum(col("n_treat").cast(dec) * col("diff6")), zero)
          .as("s"),
        coalesce(sum(col("n_treat").cast(dec)), zero).as("w"))
      .select(expr(s"CAST(${signedDiv("s", "w", spark = true)} AS BIGINT)")
        .as("att6"))
    scored.crossJoin(broadcast(att))
      .orderBy("act_bucket", "pre_buyer")
  }

  /** The generated DuckDB replay of [[eExpCem]] — same coarsening, same
    * md5 arm, means/ATT emitted from the same [[signedMean6]] /
    * [[signedDiv]] generators. */
  protected def cemOracle: String = {
    def m6(s: String, n: String) = signedMean6(s, n, spark = false)
    s"""WITH ev AS (SELECT user_id, event_type,
           epoch_ns(ts) // 86400000000000 AS day,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
       cut AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
       per AS (SELECT user_id,
           sum(CASE WHEN day < mid THEN 1 ELSE 0 END) AS pre_n,
           sum(CASE WHEN day < mid AND event_type = 'purchase'
               THEN 1 ELSE 0 END) AS pre_buys,
           sum(CASE WHEN day >= mid AND event_type = 'purchase'
               THEN cents ELSE 0 END) AS post
         FROM ev, cut GROUP BY user_id),
       strata AS (SELECT
           ('0x' || substr(md5('did|' || CAST(user_id AS VARCHAR)),
             1, 8))::BIGINT % 2 AS arm,
           CAST(CASE WHEN pre_n = 0 THEN 0 WHEN pre_n <= 2 THEN 1
                WHEN pre_n <= 5 THEN 2 WHEN pre_n <= 10 THEN 3
                ELSE 4 END AS BIGINT) AS act_bucket,
           CAST(CASE WHEN pre_buys > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS pre_buyer,
           CAST(post AS HUGEINT) AS post
         FROM per),
       cells AS (SELECT act_bucket, pre_buyer,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nc,
           sum(CASE WHEN arm = 1 THEN post ELSE 0 END) AS tpost,
           sum(CASE WHEN arm = 0 THEN post ELSE 0 END) AS cpost
         FROM strata GROUP BY act_bucket, pre_buyer),
       scored AS (SELECT act_bucket, pre_buyer,
           CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
           CAST(${m6("tpost", "nt")} AS BIGINT) AS treat_m6,
           CAST(${m6("cpost", "nc")} AS BIGINT) AS ctrl_m6,
           CAST(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS matched,
           CAST(CASE WHEN nt > 0 AND nc > 0
                THEN ${m6("tpost", "nt")} - ${m6("cpost", "nc")}
                ELSE 0 END AS BIGINT) AS diff6
         FROM cells),
       att AS (SELECT
           CAST(coalesce(sum(CAST(n_treat AS HUGEINT) * diff6), 0)
             AS HUGEINT) AS s,
           CAST(coalesce(sum(CAST(n_treat AS HUGEINT)), 0) AS HUGEINT)
             AS w
         FROM scored WHERE matched = 1)
       SELECT scored.*,
         CAST(${signedDiv("s", "w", spark = false)} AS BIGINT) AS att6
       FROM scored, att ORDER BY act_bucket, pre_buyer"""
  }

  /** The generated DuckDB replay of [[eExpDid]] — same cut points, same
    * md5 arm, the final SELECT's arithmetic emitted from the same
    * [[signedMean6]] generator so the engines cannot drift. */
  protected def didOracle: String = {
    def m6(s: String, n: String) = signedMean6(s, n, spark = false)
    s"""WITH ev AS (SELECT user_id, event_type,
           epoch_ns(ts) // 86400000000000 AS day,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
       cuts AS (SELECT (min(day) + (min(day) + max(day) + 1) // 2 + 1) // 2
             AS q,
           (min(day) + max(day) + 1) // 2 AS mid FROM ev),
       per AS (SELECT user_id,
           sum(CASE WHEN day < q THEN cents ELSE 0 END) AS pa,
           sum(CASE WHEN day >= q AND day < mid THEN cents ELSE 0 END)
             AS pb,
           sum(CASE WHEN day < mid THEN cents ELSE 0 END) AS pre,
           sum(CASE WHEN day >= mid THEN cents ELSE 0 END) AS post
         FROM ev, cuts WHERE event_type = 'purchase' GROUP BY user_id),
       panel AS (SELECT
           ('0x' || substr(md5('did|' || CAST(u.user_id AS VARCHAR)),
             1, 8))::BIGINT % 2 AS arm,
           CAST(coalesce(per.pa, 0) AS HUGEINT) AS pa,
           CAST(coalesce(per.pb, 0) AS HUGEINT) AS pb,
           CAST(coalesce(per.pre, 0) AS HUGEINT) AS pre,
           CAST(coalesce(per.post, 0) AS HUGEINT) AS post
         FROM (SELECT DISTINCT user_id FROM ev) u
         LEFT JOIN per ON u.user_id = per.user_id),
       cells AS (SELECT
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS nt,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS nc,
           sum(CASE WHEN arm = 1 THEN pre ELSE 0 END) AS tpre,
           sum(CASE WHEN arm = 1 THEN post ELSE 0 END) AS tpost,
           sum(CASE WHEN arm = 0 THEN pre ELSE 0 END) AS cpre,
           sum(CASE WHEN arm = 0 THEN post ELSE 0 END) AS cpost,
           sum(CASE WHEN arm = 1 THEN pa ELSE 0 END) AS tpa,
           sum(CASE WHEN arm = 1 THEN pb ELSE 0 END) AS tpb,
           sum(CASE WHEN arm = 0 THEN pa ELSE 0 END) AS cpa,
           sum(CASE WHEN arm = 0 THEN pb ELSE 0 END) AS cpb
         FROM panel)
       SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_ctrl,
         CAST(${m6("tpre", "nt")} AS BIGINT) AS treat_pre_m6,
         CAST(${m6("tpost", "nt")} AS BIGINT) AS treat_post_m6,
         CAST(${m6("cpre", "nc")} AS BIGINT) AS ctrl_pre_m6,
         CAST(${m6("cpost", "nc")} AS BIGINT) AS ctrl_post_m6,
         CAST((${m6("tpost", "nt")} - ${m6("tpre", "nt")})
           - (${m6("cpost", "nc")} - ${m6("cpre", "nc")}) AS BIGINT)
           AS did6,
         CAST((${m6("tpb", "nt")} - ${m6("tpa", "nt")})
           - (${m6("cpb", "nc")} - ${m6("cpa", "nc")}) AS BIGINT)
           AS placebo_did6
       FROM cells"""
  }

  /** The k-term pass@k basis-point expression over per-problem (n, c),
    * emitted ONCE for both engines so the arithmetic cannot drift
    * (`spark` toggles `div`/DECIMAL(38,0) vs `//`/HUGEINT — the only
    * dialect differences): C(n−c,k)/C(n,k) telescopes to
    * Π_{i<k}(n−c−i) / Π_{i<k}(n−i); with n ≤ 40 each k-term product is
    * ≤ 40·39·…·31 ≈ 3.1e15 (exact in BIGINT), the ×10000 step clears
    * through the wide cast, and n−c<k short-circuits to the certain
    * pass (C(n−c,k) = 0). All operands non-negative, so truncating and
    * flooring division agree. */
  private def passAtKBp(k: Int, spark: Boolean): String = {
    val num = (0 until k).map(i => s"(n - c - $i)").mkString(" * ")
    val den = (0 until k).map(i => s"(n - $i)").mkString(" * ")
    val cast = if (spark) "DECIMAL(38,0)" else "HUGEINT"
    val div = if (spark) "div" else "//"
    s"CAST(CASE WHEN n - c < $k THEN 10000 " +
      s"ELSE 10000 - (CAST($num AS $cast) * 10000) $div ($den) END " +
      "AS BIGINT)"
  }

  /** pass@k — the unbiased combinatorial estimator from the Codex paper
    * (Chen, Tworek et al. 2021, "Evaluating Large Language Models
    * Trained on Code", eq. 1): sample n candidate solutions per
    * problem, count the c that pass, and estimate
    * pass@k = E[1 − C(n−c,k)/C(n,k)] — the hypergeometric probability
    * that a size-k draw misses every passing sample, which makes the
    * naive 1−(1−c/n)^k estimator's bias vanish. THE headline metric of
    * every code-generation eval harness, and a pure integer ratio, so
    * it oracle-checks exactly. Mapping: problems ⇔ users, trials ⇔ the
    * user's first 40 events under the deterministic (ts, event_id)
    * order (the paper likewise fixes n per problem; the cap also keeps
    * every factorial product exact — see [[passAtKBp]]), a trial
    * passes when its cent grain clears 10 000. Problems with fewer
    * than 10 trials are excluded so k = 10 stays well-defined. Scale
    * shape: one user-keyed window pass caps trials, one groupBy
    * reduces the corpus to user grain, and the k ∈ {1, 5, 10} fan is a
    * 3-way stack of that bounded relation — no joins, no skew. */
  protected def llmPassAtK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trials = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 40)
    val probs = trials.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") >= 10000L, 1L).otherwise(0L)).as("c"))
      .filter(col("n") >= 10)
    probs
      .select(col("user_id"), col("n"), col("c"),
        expr(passAtKBp(1, spark = true)).as("p1"),
        expr(passAtKBp(5, spark = true)).as("p5"),
        expr(passAtKBp(10, spark = true)).as("p10"))
      .select(expr("stack(3, CAST(1 AS BIGINT), p1, CAST(5 AS BIGINT), " +
        "p5, CAST(10 AS BIGINT), p10) AS (k, bp)"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_problems"), sum(col("bp")).as("s"),
        min(col("bp")).as("min_bp"), max(col("bp")).as("max_bp"))
      .select(col("k"), col("n_problems"),
        expr("s div n_problems").as("mean_bp"),
        col("min_bp"), col("max_bp"))
      .orderBy("k")
  }

  /** The bandit arms: the canonical channel universe plus the
    * conversion type — a FIXED sorted list shared by the Spark plan and
    * the generated oracle (the [[markovCanonicalChannels]] contract),
    * so the per-arm conditional windows and the argmax CASE chain are
    * generated identically on both sides. */
  protected val banditArms: Seq[String] =
    (markovCanonicalChannels :+ "purchase").sorted

  /** Offline bandit policy evaluation by REPLAY (Li, Chu, Langford &
    * Wang 2011, "Unbiased offline evaluation of contextual-bandit-based
    * news article recommendation algorithms", WSDM — the estimator:
    * walk the logged stream, keep exactly the rows where the candidate
    * policy picks the logged arm, and average their rewards): the
    * candidate is a per-user greedy policy with optimistic cold start —
    * at each logged event it picks the arm with the highest exact
    * running success rate over that user's PRIOR events (unpulled arms
    * rank above every pulled one via a 2·10⁶ sentinel > any real 10⁶
    * mean; ties break to the lexicographically smallest arm). Reward =
    * the cent grain clearing 10 000. Everything is integer (the mean is
    * suc·10⁶ div cnt on non-negative operands), so the replay set — not
    * just the estimate — is bit-identical across engines. Scale shape:
    * ONE user-keyed window pass computes all 2·|arms| running sums
    * (shared frame, one shuffle), and the aggregate is a 5-row
    * groupBy; per-user policy state never leaves the window. */
  protected def eBanditReplay(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arms = banditArms
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        expr("CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) >= 10000 " +
          "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("r"))
    val observed = ev.select(col("event_type")).distinct()
      .orderBy("event_type").collect().map(_.getString(0))
    val extra = observed.toSet -- arms
    require(extra.isEmpty,
      s"bandit replay: observed arms ${extra.mkString(",")} outside the " +
        s"canonical universe ${arms.mkString("{", ",", "}")} the policy " +
        "CASE chain is generated over - extend banditArms")
    val withStats = arms.zipWithIndex.foldLeft(ev) { case (df, (a, i)) =>
      df.withColumn(s"c$i", coalesce(
          sum(when(col("event_type") === a, 1L).otherwise(0L)).over(w),
          lit(0L)))
        .withColumn(s"s$i", coalesce(
          sum(when(col("event_type") === a, col("r")).otherwise(0L)).over(w),
          lit(0L)))
    }
    val meanExprs = arms.indices.map(i =>
      s"CASE WHEN c$i = 0 THEN CAST(2000000 AS BIGINT) " +
        s"ELSE s$i * 1000000 div c$i END AS m$i")
    val best = arms.indices.map(i => s"m$i").mkString("greatest(", ", ", ")")
    val pick = arms.zipWithIndex
      .map { case (a, i) => s"WHEN m$i = best THEN '$a'" }
      .mkString("CASE ", " ", " END")
    withStats
      .selectExpr(Seq("event_type", "r") ++ meanExprs: _*)
      .withColumn("best", expr(best))
      .withColumn("pick", expr(pick))
      .groupBy(col("event_type").as("arm"))
      .agg(count(lit(1)).as("n_logged"),
        sum(when(col("pick") === col("event_type"), 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("pick") === col("event_type"), col("r")).otherwise(0L))
          .as("matched_successes"))
      .select(col("arm"), col("n_logged"), col("n_matched"),
        col("matched_successes"),
        expr("n_matched * 10000 div n_logged").as("match_rate_bp"),
        expr("CASE WHEN n_matched = 0 THEN CAST(-1 AS BIGINT) " +
          "ELSE matched_successes * 10000 div n_matched END").as("est_bp"))
      .orderBy("arm")
  }

  /** Generated DuckDB replay for [[eBanditReplay]]: the identical
    * per-arm conditional running windows, sentinel means, argmax CASE
    * chain, and replay aggregate over [[banditArms]]. */
  protected def banditReplayOracle: String = {
    val arms = banditArms
    val stats = arms.zipWithIndex.map { case (a, i) =>
      s"""coalesce(CAST(sum(CASE WHEN event_type = '$a' THEN 1 ELSE 0 END)
             OVER uw AS BIGINT), 0) AS c$i,
           coalesce(CAST(sum(CASE WHEN event_type = '$a' THEN r ELSE 0 END)
             OVER uw AS BIGINT), 0) AS s$i"""
    }.mkString(",\n           ")
    val means = arms.indices.map(i =>
      s"CASE WHEN c$i = 0 THEN CAST(2000000 AS BIGINT) " +
        s"ELSE s$i * 1000000 // c$i END AS m$i").mkString(",\n           ")
    val best = arms.indices.map(i => s"m$i").mkString("greatest(", ", ", ")")
    val pick = arms.zipWithIndex
      .map { case (a, i) => s"WHEN m$i = best THEN '$a'" }
      .mkString("CASE ", " ", " END")
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
             event_type,
             CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) >= 10000
                  THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r
           FROM events),
         st AS (SELECT event_type, r,
           $stats
           FROM ev WINDOW uw AS (PARTITION BY user_id
             ORDER BY tsn, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         mn AS (SELECT event_type, r,
           $means
           FROM st),
         pk AS (SELECT event_type, r, $pick AS pick
           FROM (SELECT *, $best AS best FROM mn))
         SELECT event_type AS arm, CAST(count(*) AS BIGINT) AS n_logged,
           CAST(sum(CASE WHEN pick = event_type THEN 1 ELSE 0 END)
             AS BIGINT) AS n_matched,
           CAST(sum(CASE WHEN pick = event_type THEN r ELSE 0 END)
             AS BIGINT) AS matched_successes,
           CAST(sum(CASE WHEN pick = event_type THEN 1 ELSE 0 END)
             AS BIGINT) * 10000
             // CAST(count(*) AS BIGINT) AS match_rate_bp,
           CASE WHEN sum(CASE WHEN pick = event_type THEN 1 ELSE 0 END) = 0
                THEN CAST(-1 AS BIGINT)
                ELSE CAST(sum(CASE WHEN pick = event_type THEN r ELSE 0 END)
                  AS BIGINT) * 10000
                  // CAST(sum(CASE WHEN pick = event_type THEN 1 ELSE 0 END)
                    AS BIGINT) END AS est_bp
         FROM pk GROUP BY 1 ORDER BY arm"""
  }

  /** Bradley–Terry pairwise-preference ranking (Bradley & Terry 1952)
    * fit by Hunter's MM algorithm (Hunter 2004, "MM algorithms for
    * generalized Bradley-Terry models", the update
    * wᵢ ← Wᵢ / Σ_j n_ij/(wᵢ+w_j)) — the model Chatbot-Arena-style LLM
    * eval (Chiang et al. 2024) uses to turn pairwise battles into a
    * leaderboard. Battles: consecutive event pairs per user under the
    * deterministic (ts, event_id) order where the types differ and the
    * cent grains differ — the higher grain wins (equal grains are
    * ties and skipped, as in the arena). Exactness: the corpus reduces
    * to a ≤ T² win/battle matrix (T = battle-observed event types,
    * required ≤ 12 — the Shapley driver-fold precedent), then 20 MM
    * iterations run on the integer micro grid with truncating division
    * and a sum-normalization to T·10⁶ per iteration; the oracle
    * replays the same 20 iterations as generated CTE pairs over
    * HUGEINT, so both engines walk bit-identical score trajectories —
    * no convergence tolerance anywhere. A zero MM denominator (every
    * opponent share truncates to 0 — tiny fixtures) keeps the previous
    * score on both sides. Scale shape: ONE user-keyed window pass
    * builds battles, one groupBy reduces to the bounded matrix, and
    * the driver fold is O(T²·iterations) — corpus size only ever
    * enters through the matrix counts. */
  protected def eBtArena(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("a"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("va"))
    val counts = ev
      .withColumn("b", lead(col("a"), 1).over(w))
      .withColumn("vb", lead(col("va"), 1).over(w))
      .filter(col("b").isNotNull && col("a") =!= col("b")
        && col("va") =!= col("vb"))
      .select(
        when(col("va") > col("vb"), col("a")).otherwise(col("b"))
          .as("winner"),
        when(col("va") > col("vb"), col("b")).otherwise(col("a"))
          .as("loser"))
      .groupBy("winner", "loser").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val types = counts.keys.flatMap { case (a, b) => Seq(a, b) }
      .toSeq.distinct.sorted
    if (types.isEmpty)
      return Seq.empty[(String, Long, Long, Long, Long)]
        .toDF("event_type", "n_battles", "wins", "bt_micro", "bt_rank")
    require(types.size <= 12,
      s"bt arena: ${types.size} battle types exceed the bounded-universe " +
        "contract (<= 12) the T^2 driver matrix assumes")
    val m = types.size
    val idx = types.zipWithIndex.toMap
    val nij = Array.ofDim[Long](m, m)
    val wins = Array.fill(m)(0L)
    counts.foreach { case ((wn, ls), c) =>
      val i = idx(wn); val j = idx(ls)
      nij(i)(j) += c; nij(j)(i) += c; wins(i) += c
    }
    var wv: IndexedSeq[BigInt] = IndexedSeq.fill(m)(BigInt(1000000))
    for (_ <- 1 to 20) {
      val raw = (0 until m).map { i =>
        val den = (0 until m).iterator
          .filter(j => j != i && nij(i)(j) > 0)
          .map(j => (BigInt(nij(i)(j)) * 1000000) / (wv(i) + wv(j))).sum
        if (den == 0) wv(i) else (BigInt(wins(i)) * 1000000) / den
      }
      val s = raw.sum
      require(s > 0, "bt arena: all scores collapsed to zero")
      wv = raw.map(r => (r * m * 1000000) / s)
    }
    val ranked = types.indices
      .sortBy(i => (-wv(i).toLong, types(i)))
      .zipWithIndex
      .map { case (i, r) =>
        (types(i), nij(i).sum, wins(i), wv(i).toLong, r + 1L)
      }
    ranked.toDF("event_type", "n_battles", "wins", "bt_micro", "bt_rank")
      .orderBy("bt_rank")
  }

  /** Generated DuckDB replay for [[eBtArena]]: the battle window, the
    * symmetric matrix, then 20 unrolled (raw, normalize) CTE pairs with
    * the identical HUGEINT truncating arithmetic. */
  protected def btArenaOracle: String = {
    val iters = (1 to 20).map { t =>
      val prev = if (t == 1) "it0" else s"it${t - 1}"
      s"""r$t AS MATERIALIZED (SELECT a.i,
             CASE WHEN coalesce(d.den, 0) = 0 THEN a.w
                  ELSE (CAST(wn.wins AS HUGEINT) * 1000000) // d.den
             END AS w
           FROM $prev a JOIN wn ON wn.i = a.i
           LEFT JOIN (SELECT s.i,
               SUM((CAST(s.n AS HUGEINT) * 1000000) // (wi.w + wj.w))
                 AS den
             FROM sy s JOIN $prev wi ON s.i = wi.i
             JOIN $prev wj ON s.j = wj.i
             GROUP BY s.i) d ON d.i = a.i),
         it$t AS MATERIALIZED (SELECT i,
             (w * (SELECT m FROM mm) * 1000000)
               // (SELECT SUM(w) FROM r$t) AS w
           FROM r$t)"""
    }.mkString(",\n         ")
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
             event_type AS a,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS va
           FROM events),
         nx AS (SELECT a, va,
             lead(a) OVER (PARTITION BY user_id ORDER BY tsn, event_id)
               AS b,
             lead(va) OVER (PARTITION BY user_id ORDER BY tsn, event_id)
               AS vb
           FROM ev),
         bt AS (SELECT CASE WHEN va > vb THEN a ELSE b END AS winner,
             CASE WHEN va > vb THEN b ELSE a END AS loser
           FROM nx WHERE b IS NOT NULL AND a <> b AND va <> vb),
         wl AS MATERIALIZED (SELECT winner, loser,
             CAST(count(*) AS BIGINT) AS n
           FROM bt GROUP BY 1, 2),
         sym AS (SELECT winner AS i, loser AS j, n FROM wl
           UNION ALL SELECT loser, winner, n FROM wl),
         sy AS MATERIALIZED (SELECT i, j, CAST(sum(n) AS BIGINT) AS n
           FROM sym GROUP BY 1, 2),
         uni AS MATERIALIZED (SELECT DISTINCT i FROM sym),
         wn AS MATERIALIZED (SELECT u.i,
             CAST(coalesce(ww.c, 0) AS BIGINT) AS wins
           FROM uni u LEFT JOIN (SELECT winner AS i,
               CAST(sum(n) AS BIGINT) AS c FROM wl GROUP BY 1) ww
             ON ww.i = u.i),
         mm AS MATERIALIZED (SELECT CAST(count(*) AS HUGEINT) AS m
           FROM uni),
         it0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS w
           FROM uni),
         $iters
         SELECT t.i AS event_type, nb.n_battles, wn.wins,
           CAST(t.w AS BIGINT) AS bt_micro,
           CAST(row_number() OVER (ORDER BY t.w DESC, t.i) AS BIGINT)
             AS bt_rank
         FROM it20 t JOIN wn ON wn.i = t.i
         JOIN (SELECT i, CAST(sum(n) AS BIGINT) AS n_battles
           FROM sy GROUP BY 1) nb ON nb.i = t.i
         ORDER BY bt_rank"""
  }

  protected val eventOracleSql: ListMap[String, String] = ListMap(
    "q_e_did" -> didOracle,
    "q_e_cem" -> cemOracle,
    "q_e_decay_score" -> decayOracle,
    "q_e_bt_arena" -> btArenaOracle,
    "q_e_bandit_replay" -> banditReplayOracle,
    "q_llm_pass_at_k" ->
      s"""WITH tr AS (SELECT user_id,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
             row_number() OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS rn
           FROM events),
         pr AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN v >= 10000 THEN 1 ELSE 0 END) AS BIGINT)
               AS c
           FROM tr WHERE rn <= 40 GROUP BY 1 HAVING count(*) >= 10),
         pk AS (
           SELECT CAST(1 AS BIGINT) AS k,
             ${passAtKBp(1, spark = false)} AS bp FROM pr
           UNION ALL SELECT CAST(5 AS BIGINT),
             ${passAtKBp(5, spark = false)} FROM pr
           UNION ALL SELECT CAST(10 AS BIGINT),
             ${passAtKBp(10, spark = false)} FROM pr)
         SELECT k, CAST(count(*) AS BIGINT) AS n_problems,
           CAST(CAST(sum(bp) AS HUGEINT) // count(*) AS BIGINT) AS mean_bp,
           CAST(min(bp) AS BIGINT) AS min_bp,
           CAST(max(bp) AS BIGINT) AS max_bp
         FROM pk GROUP BY k ORDER BY k""",
    "q_e_events_summary" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS users
         FROM events GROUP BY event_type ORDER BY event_type""",
    // Session cut + ordered path assembly + rank-limit top-10; the rn<=40
    // CASE inside string_agg is the deterministic 40-event path prefix
    // (aggregates skip NULLs, so no stray separators).
    "q_e_session_paths" ->
      """WITH ev AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
             event_type FROM events),
         s1 AS (SELECT *, CASE WHEN tsn - lag(tsn) OVER
               (PARTITION BY user_id ORDER BY tsn, event_id)
               > 1800000000000 THEN 1 ELSE 0 END AS gap
           FROM ev),
         s2 AS (SELECT *, CAST(sum(gap) OVER (PARTITION BY user_id
             ORDER BY tsn, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
             CURRENT ROW) AS BIGINT) AS sid FROM s1),
         s3 AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
             ORDER BY tsn, event_id) AS rn FROM s2),
         paths AS (SELECT user_id, sid,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(CASE WHEN rn <= 40 THEN event_type END, '>'
               ORDER BY tsn, event_id) AS path
           FROM s3 GROUP BY 1, 2),
         bp AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(sum(n_events) AS BIGINT) AS n_events
           FROM paths GROUP BY 1),
         rnk AS (SELECT *, CAST(row_number() OVER (ORDER BY
             n_sessions DESC, path) AS BIGINT) AS rk FROM bp)
         SELECT rk, path, n_sessions, n_users, n_events
         FROM rnk WHERE rk <= 10 ORDER BY rk""",
    "q_exp_trend" ->
      """WITH per AS (SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_ev,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS buys
           FROM events GROUP BY user_id),
         scored AS (SELECT
             CAST(least(n_ev // 20, 4) AS BIGINT) AS w,
             CASE WHEN buys > 0 THEN 1 ELSE 0 END AS conv
           FROM per),
         buckets AS (SELECT w, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(conv) AS BIGINT) AS r
           FROM scored GROUP BY w),
         b2 AS (SELECT w, n, r,
             CAST(r * 1000000 // n AS BIGINT) AS rate6 FROM buckets),
         m AS (SELECT CAST(sum(n) AS HUGEINT) AS nn,
             CAST(sum(r) AS HUGEINT) AS rr,
             CAST(sum(w * r) AS HUGEINT) AS swr,
             CAST(sum(w * n) AS HUGEINT) AS swn,
             CAST(sum(w * w * n) AS HUGEINT) AS sw2n
           FROM buckets),
         s AS (SELECT CAST(nn AS BIGINT) AS n_users,
             CAST(rr AS BIGINT) AS n_conv,
             CAST(CASE
               WHEN rr = 0 OR rr = nn
                 OR nn * sw2n - swn * swn = 0 THEN -1
               WHEN nn > 2000000 THEN -2
               ELSE (nn * (nn * swr - rr * swn) * (nn * swr - rr * swn)
                     * 1000000)
                    // (rr * (nn - rr) * (nn * sw2n - swn * swn))
               END AS BIGINT) AS z2_6
           FROM m),
         s2 AS (SELECT *,
             CAST(CASE WHEN z2_6 >= 3841459 THEN 1 ELSE 0 END AS BIGINT)
               AS trend_sig
           FROM s)
         SELECT b2.*, s2.* FROM b2, s2 ORDER BY w""",
    "q_e_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
           f AS (SELECT user_id, event_id, tsn,
                   CASE WHEN lag(tsn) OVER w IS NULL THEN 0
                        WHEN tsn - lag(tsn) OVER w > 1800000000000 THEN 1
                        ELSE 0 END AS newf
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
           s AS (SELECT user_id, tsn,
                   SUM(newf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS session_id
                 FROM f),
           iv AS (SELECT user_id, session_id,
                   min(tsn) // 3600000000000 AS h0,
                   max(tsn) // 3600000000000 AS h1
                 FROM s GROUP BY 1, 2),
           mm AS (SELECT min(h0) AS lo, max(h1) AS hi FROM iv),
           hrs AS (SELECT lo + unnest(range(0, CAST(hi - lo + 1 AS BIGINT)))
                     AS h FROM mm),
           c AS (SELECT h, CAST(count(*) AS BIGINT) AS n_active,
                   CAST(sum(CASE WHEN h0 = h THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_starting
                 FROM iv JOIN hrs ON h0 <= h AND h <= h1 GROUP BY h)
         SELECT h // 24 AS day, h % 24 AS hour_of_day, h AS hour_idx,
           n_active, n_starting
         FROM c ORDER BY n_active DESC, hour_idx LIMIT 20""",
    "q_e_sessions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
           f AS (SELECT user_id, event_id, tsn,
                   CASE WHEN lag(tsn) OVER w IS NULL THEN 0
                        WHEN tsn - lag(tsn) OVER w > 1800000000000 THEN 1
                        ELSE 0 END AS newf
                 FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
           s AS (SELECT user_id,
                   SUM(newf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                 FROM f),
           c AS (SELECT user_id, session_id, count(*) AS n FROM s GROUP BY 1, 2)
         SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
                count(*) AS n_sessions,
                CAST(max(n) AS BIGINT) AS max_session_events
         FROM c GROUP BY user_id ORDER BY user_id""",
    "q_e_props_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_w_running_total" ->
      """SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
             AS running_total
         FROM orders WHERE o_custkey <= 200
         ORDER BY o_custkey, o_orderkey""",
    "q_e_band_join" ->
      """WITH ev AS (SELECT event_id, epoch_ns(ts) // 1000 AS us, user_id,
                       event_type, value
                     FROM events WHERE user_id < 50)
         SELECT l.user_id, l.event_id AS l_event_id, r.event_id AS r_event_id,
                l.event_type AS l_type, r.event_type AS r_type,
                (r.us // 1000) - (l.us // 1000) AS lag_ms,
                l.value + r.value AS pair_value
         FROM ev l JOIN ev r
           ON l.user_id = r.user_id
          AND r.us >= l.us AND r.us <= l.us + 3600000000
         WHERE l.event_type = 'view' AND r.event_type = 'click'
         ORDER BY l.user_id, l_event_id, r_event_id""",
    "q_w_lag_ma" ->
      """SELECT user_id, event_id, value,
              row_number() OVER w AS rn,
              FLOOR((value - COALESCE(lag(value, 1) OVER w, 0)) * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS delta,
              FLOOR(CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER w3 AS DOUBLE)
                / COUNT(*) OVER w3 * 1e4 + CAST(0.5 AS DOUBLE)) / 1e4 AS ma3
         FROM events WHERE user_id < 10
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                w3 AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, rn""",
    "q_e_funnel_conversion" ->
      """WITH f AS (SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
           FROM events GROUP BY user_id)
         SELECT count(*) AS n_users,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_click_after_signup,
           CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                     AND t_purchase > t_click
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
         FROM f""",
    "q_w_rank_suite" ->
      """SELECT o_orderstatus, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           floor(percent_rank() OVER w * 1000000 + CAST(0.5 AS DOUBLE))
             / 1000000 AS prank,
           floor(cume_dist() OVER w * 1000000 + CAST(0.5 AS DOUBLE))
             / 1000000 AS cdist,
           ntile(4) OVER w AS tile
         FROM orders WHERE o_orderkey % 97 = 0
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderstatus, rnk""",
    "q_e_retention" ->
      """WITH e AS (SELECT user_id,
                 epoch_ns(ts) // 604800000000000 AS wk FROM events),
         f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
         a AS (SELECT DISTINCT f.cohort_wk, e.wk - f.cohort_wk AS wk_since,
                 e.user_id
               FROM e JOIN f USING (user_id)),
         cs AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_n
                FROM f GROUP BY cohort_wk),
         r AS (SELECT cohort_wk, wk_since, CAST(count(*) AS BIGINT) AS n_active
               FROM a GROUP BY cohort_wk, wk_since)
         SELECT r.cohort_wk, r.wk_since, r.n_active,
           floor(r.n_active * 10000.0 / cs.cohort_n + 0.5) / 10000 AS retention
         FROM r JOIN cs USING (cohort_wk)
         ORDER BY cohort_wk, wk_since""",
    // Struct-max ordering (ts, id, type) replays field-for-field; max
    // ignores the NULL purchase candidates on both engines.
    "q_e_attribution" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id, event_type
               FROM events),
         tch AS (SELECT *,
             max(CASE WHEN event_type <> 'purchase'
                 THEN {'ts': tsn, 'event_id': event_id,
                       'event_type': event_type} END)
               OVER (PARTITION BY user_id ORDER BY tsn, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_c
           FROM e),
         conv AS (SELECT COALESCE(last_c.event_type, 'none') AS last_touch
               FROM tch WHERE event_type = 'purchase')
         SELECT last_touch, CAST(count(*) AS BIGINT) AS n_conversions,
           floor(count(*) * 10000.0 / sum(count(*)) OVER () + 0.5) / 10000
             AS frac
         FROM conv GROUP BY last_touch ORDER BY last_touch""",
    // RANGE frame on epoch-ns; decimal frame sums on both engines.
    "q_w_time_range_sum" ->
      """SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           floor(CAST(sum(CAST(value AS DECIMAL(20,4))) OVER w AS DOUBLE)
             * 10000 + CAST(0.5 AS DOUBLE)) / 10000 AS sum_last_hour
         FROM (SELECT user_id, epoch_ns(ts) AS tsn, event_id, value
               FROM events WHERE user_id < 20)
         WINDOW w AS (PARTITION BY user_id ORDER BY tsn
                      RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW)
         ORDER BY user_id, event_id""",
    "q_e_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS prev_type
           FROM events),
         t2 AS (SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS n
           FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, n,
           floor(n * 10000.0 / sum(n) OVER () + 0.5) / 10000 AS frac
         FROM t2 ORDER BY n DESC, prev_type, next_type LIMIT 20""",
    // Exact integer (n, Σ, Σ²) trailing frames (Σ² in HUGEINT — the
    // Long form wraps from ~3e9 events per day-cell); the Σ·Σ square
    // and everything after runs in DOUBLE on both engines, one fixed
    // IEEE op order; z floors to 4 dp.
    "q_e_anomaly" ->
      """WITH b AS (SELECT event_type,
                      epoch_ns(ts) // 86400000000000 AS day,
                      CAST(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
           w AS (SELECT event_type, day, cnt,
                   count(*) OVER tw AS w_n,
                   sum(cnt) OVER tw AS w_sum,
                   sum(CAST(cnt AS HUGEINT) * cnt) OVER tw AS w_sumsq
                 FROM b WINDOW tw AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
           s AS (SELECT event_type, day, cnt, w_sum / 10.0 AS mean,
                   (CAST(w_sumsq AS DOUBLE)
                     - CAST(w_sum AS DOUBLE) * CAST(w_sum AS DOUBLE)
                       / 10.0) / 10.0 AS variance
                 FROM w WHERE w_n = 10),
           z AS (SELECT event_type, day, cnt,
                   floor((cnt - mean) / sqrt(variance) * 10000 + 0.5) / 10000
                     AS z4
                 FROM s WHERE variance > 0)
         SELECT event_type, day, cnt, z4, abs(z4) >= 3.0 AS is_anomaly
         FROM z ORDER BY abs(z4) DESC, event_type, day LIMIT 5""",
    // Markov-entropy replay: same ordered lag, same floor-then-sum
    // micro-units, same truncating division per state.
    "q_e_markov_entropy" ->
      """WITH s AS (SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS prev_type
           FROM events),
         t2 AS (SELECT prev_type, event_type AS next_type,
             CAST(count(*) AS BIGINT) AS c
           FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type,
           CAST(sum(c) AS BIGINT) AS n_out,
           CAST(count(*) AS BIGINT) AS n_next,
           CAST((CAST(FLOOR(ln(CAST(sum(c) AS DOUBLE)) * 1e6) AS HUGEINT)
               * sum(c)
             - sum(CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1e6) AS HUGEINT) * c))
             // sum(c) AS BIGINT) AS h_micro
         FROM t2 GROUP BY prev_type ORDER BY prev_type""",
    // Pareto replay: the oracle takes the global-window luxury; the
    // engine's two-layer bucketed prefix ranks compose to the identical
    // (c desc, user_id) total order.
    "q_e_power_users" ->
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
                    FROM events GROUP BY 1),
         rk AS (SELECT c,
                  CAST(row_number() OVER (ORDER BY c DESC, user_id)
                    AS BIGINT) AS r,
                  CAST(sum(c) OVER (ORDER BY c DESC, user_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
                FROM u),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS nu,
                   CAST(sum(c) AS BIGINT) AS ne FROM u)
         SELECT tot.nu AS n_users, tot.ne AS n_events,
           (SELECT CAST(min(r) AS BIGINT) FROM rk, tot
            WHERE cum * 5 >= ne * 4) AS users_for_80pct,
           CAST(((SELECT min(r) FROM rk, tot WHERE cum * 5 >= ne * 4)
             * 1000000) // tot.nu AS BIGINT) AS user_share_micro
         FROM tot""",
    // Interval-union replay: same running-max island edge-detect, same
    // integer nanosecond bounds.
    "q_w_interval_union" ->
      """WITH iv AS (SELECT user_id, epoch_ns(ts) AS s,
             epoch_ns(ts) + 300000000000 AS e
           FROM events WHERE user_id < 40),
         m AS (SELECT user_id, s, e,
                 max(e) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS pmax
               FROM iv),
         isl AS (SELECT user_id, s, e,
                  CAST(sum(CASE WHEN pmax IS NULL OR s > pmax
                    THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
                    ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS BIGINT) AS isl
                 FROM m),
         g AS (SELECT user_id, isl, CAST(min(s) AS BIGINT) AS s0,
                 CAST(max(e) AS BIGINT) AS e1,
                 CAST(count(*) AS BIGINT) AS n
               FROM isl GROUP BY 1, 2)
         SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(e1 - s0) AS BIGINT) AS covered_ns
         FROM g GROUP BY user_id ORDER BY user_id""",
    // Burstiness replay: same ordered-lag gaps, same cleared moments,
    // one sqrt per user.
    "q_e_burstiness" ->
      """WITH s AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id
           FROM events WHERE user_id < 40),
         g AS (SELECT user_id,
                 tsn - lag(tsn) OVER (PARTITION BY user_id
                   ORDER BY tsn, event_id) AS g
               FROM s),
         m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(g AS HUGEINT)) AS HUGEINT) AS sg,
                 CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sg2
               FROM g WHERE g IS NOT NULL GROUP BY 1)
         SELECT user_id, n AS n_gaps,
           CAST(sg // n AS BIGINT) AS mean_gap_ns,
           FLOOR((sqrt(CAST(CAST(n AS HUGEINT) * sg2 - sg * sg AS DOUBLE))
               - CAST(sg AS DOUBLE))
             / (sqrt(CAST(CAST(n AS HUGEINT) * sg2 - sg * sg AS DOUBLE))
               + CAST(sg AS DOUBLE))
             * 1e4) / 1e4 AS b4
         FROM m WHERE n >= 2 ORDER BY user_id""",
    // Sliding-distinct replay: same two-window fan-out and dedup.
    "q_w_sliding_distinct" ->
      """WITH ev AS (SELECT user_id,
             epoch_ns(ts) // 300000000000 AS h
           FROM events),
         w AS (SELECT DISTINCT user_id, win FROM (
             SELECT user_id, h - 1 AS win FROM ev
             UNION ALL SELECT user_id, h FROM ev))
         SELECT win, CAST(count(*) AS BIGINT) AS n_distinct_users
         FROM w GROUP BY win ORDER BY win""",
    // Kaplan-Meier replay: per-user (first, last, first-purchase) pass,
    // day-grain aggregate with a DESC-ordered suffix-sum risk set, then a
    // recursive CTE carrying s_micro through the identical truncating
    // (s * (n_risk - d)) // n_risk product, deaths-before-censorings.
    "q_e_survival" ->
      """WITH RECURSIVE u AS (SELECT user_id,
             min(epoch_ns(ts) // 86400000000000) AS fd,
             max(epoch_ns(ts) // 86400000000000) AS ld,
             min(CASE WHEN event_type = 'purchase'
               THEN epoch_ns(ts) // 86400000000000 END) AS pd
           FROM events GROUP BY user_id),
         lt AS (SELECT CASE WHEN pd IS NOT NULL THEN pd - fd
                            ELSE ld - fd END AS t,
             CASE WHEN pd IS NOT NULL THEN 1 ELSE 0 END AS ev FROM u),
         bt AS (SELECT t, CAST(count(*) AS BIGINT) AS n_at,
             CAST(sum(ev) AS BIGINT) AS d,
             CAST(sum(1 - ev) AS BIGINT) AS c
           FROM lt GROUP BY t),
         rk AS (SELECT t, n_at, d, c,
             CAST(sum(n_at) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk,
             CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
           FROM bt),
         km AS (
           SELECT i, t, n_risk, d, c,
             CASE WHEN d > 0 THEN (1000000 * (n_risk - d)) // n_risk
                  ELSE CAST(1000000 AS BIGINT) END AS s
           FROM rk WHERE i = 1
           UNION ALL
           SELECT rk.i, rk.t, rk.n_risk, rk.d, rk.c,
             CASE WHEN rk.d > 0 THEN (km.s * (rk.n_risk - rk.d)) // rk.n_risk
                  ELSE km.s END
           FROM km JOIN rk ON rk.i = km.i + 1)
         SELECT t, n_risk, d AS n_events, c AS n_censored,
           CAST(s AS BIGINT) AS s_micro
         FROM km WHERE d > 0 ORDER BY t""",
    // Generated matrix-vector replay — see [[markovStationaryOracle]].
    "q_e_markov_stationary" -> markovStationaryOracle,
    // Trigram replay: the same per-user lag x2 window and top-20 order.
    "q_e_trigrams" ->
      """WITH s AS (SELECT user_id, event_type,
             lag(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS t1,
             lag(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY epoch_ns(ts), event_id) AS t2
           FROM events),
         tri AS (SELECT t1, t2, event_type AS t3,
             CAST(count(*) AS BIGINT) AS n
           FROM s WHERE t1 IS NOT NULL AND t2 IS NOT NULL
           GROUP BY 1, 2, 3),
         tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM tri)
         SELECT t1, t2, t3, n, n * 10000 // tot AS frac4
         FROM tri, tt ORDER BY n DESC, t1, t2, t3 LIMIT 20""",
    // Cohort-revenue replay: same week grain, cent floor, cohort join,
    // truncating ARPU.
    "q_e_cohort_revenue" ->
      """WITH e AS (SELECT user_id,
             epoch_ns(ts) // 604800000000000 AS wk, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events),
         f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
         cs AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS cohort_n
                FROM f GROUP BY 1),
         r AS (SELECT f.cohort_wk, e.wk - f.cohort_wk AS wk_since,
             CAST(count(*) AS BIGINT) AS n_purchases,
             CAST(sum(e.cents) AS BIGINT) AS cents
           FROM e JOIN f USING (user_id)
           WHERE e.event_type = 'purchase' GROUP BY 1, 2)
         SELECT r.cohort_wk, r.wk_since, r.n_purchases, r.cents,
           r.cents // cs.cohort_n AS arpu_cents
         FROM r JOIN cs ON r.cohort_wk = cs.cohort_wk
         ORDER BY r.cohort_wk, r.wk_since""",
    "q_e_dau_wau_mau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day FROM events),
         dau AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(c) AS BIGINT) AS sum_dau
           FROM (SELECT day, CAST(count(*) AS BIGINT) AS c FROM ud
                 GROUP BY day)),
         wau AS (SELECT CAST(count(*) AS BIGINT) AS n_weeks,
             CAST(sum(c) AS BIGINT) AS sum_wau
           FROM (SELECT wk, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT DISTINCT user_id, day // 7 AS wk FROM ud)
                 GROUP BY wk)),
         mau AS (SELECT CAST(count(*) AS BIGINT) AS n_months,
             CAST(sum(c) AS BIGINT) AS sum_mau
           FROM (SELECT mo, CAST(count(*) AS BIGINT) AS c
                 FROM (SELECT DISTINCT user_id, day // 30 AS mo FROM ud)
                 GROUP BY mo))
         SELECT n_days, sum_dau // n_days AS avg_dau,
           n_weeks, sum_wau // n_weeks AS avg_wau,
           n_months, sum_mau // n_months AS avg_mau,
           (sum_dau // n_days) * 10000 // (sum_mau // n_months)
             AS stickiness4
         FROM dau, wau, mau""",
    "q_e_lag_to_convert" ->
      """WITH e AS (SELECT user_id, event_type,
             epoch_ns(ts) // 86400000000000 AS day FROM events),
         s AS (SELECT user_id, min(day) AS sd FROM e
               WHERE event_type = 'signup' GROUP BY 1),
         conv AS (SELECT e.user_id, min(e.day - s.sd) AS lag
           FROM e JOIN s ON e.user_id = s.user_id
           WHERE e.event_type = 'purchase' AND e.day >= s.sd GROUP BY 1),
         b AS (SELECT CASE WHEN conv.lag IS NULL THEN 'none'
               WHEN conv.lag = 0 THEN '0' WHEN conv.lag = 1 THEN '1'
               WHEN conv.lag = 2 THEN '2' WHEN conv.lag <= 6 THEN '3_6'
               WHEN conv.lag <= 13 THEN '7_13' ELSE '14_plus' END
                 AS bucket
           FROM s LEFT JOIN conv ON s.user_id = conv.user_id),
         g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_users
               FROM b GROUP BY 1)
         SELECT bucket, n_users,
           n_users * 10000 // (SELECT CAST(count(*) AS BIGINT) FROM s)
             AS frac4
         FROM g ORDER BY bucket""",
    // quantile_cont pairs with Spark's interpolating percentile() (the
    // proven equi-depth pairing); thresholds round to integers on both
    // sides so quintile binning never compares raw doubles.
    "q_e_rfm" ->
      """WITH p AS (SELECT user_id,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
           FROM events WHERE event_type = 'purchase'),
         per AS (SELECT user_id, max(day) AS last_day,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(cents) AS BIGINT) AS cents
           FROM p GROUP BY 1),
         rfm AS (SELECT user_id,
             (SELECT max(last_day) FROM per) - last_day AS rec_days,
             freq, cents FROM per),
         th AS (SELECT
             CAST(floor(quantile_cont(rec_days, 0.2) + 0.5) AS BIGINT) AS r1,
             CAST(floor(quantile_cont(rec_days, 0.4) + 0.5) AS BIGINT) AS r2,
             CAST(floor(quantile_cont(rec_days, 0.6) + 0.5) AS BIGINT) AS r3,
             CAST(floor(quantile_cont(rec_days, 0.8) + 0.5) AS BIGINT) AS r4,
             CAST(floor(quantile_cont(freq, 0.2) + 0.5) AS BIGINT) AS f1,
             CAST(floor(quantile_cont(freq, 0.4) + 0.5) AS BIGINT) AS f2,
             CAST(floor(quantile_cont(freq, 0.6) + 0.5) AS BIGINT) AS f3,
             CAST(floor(quantile_cont(freq, 0.8) + 0.5) AS BIGINT) AS f4,
             CAST(floor(quantile_cont(cents, 0.2) + 0.5) AS BIGINT) AS m1,
             CAST(floor(quantile_cont(cents, 0.4) + 0.5) AS BIGINT) AS m2,
             CAST(floor(quantile_cont(cents, 0.6) + 0.5) AS BIGINT) AS m3,
             CAST(floor(quantile_cont(cents, 0.8) + 0.5) AS BIGINT) AS m4
           FROM rfm),
         sc AS (SELECT cents,
             CAST(6 - (CASE WHEN rec_days <= r1 THEN 1
                            WHEN rec_days <= r2 THEN 2
                            WHEN rec_days <= r3 THEN 3
                            WHEN rec_days <= r4 THEN 4 ELSE 5 END)
               AS BIGINT) AS r_score,
             CAST(CASE WHEN freq <= f1 THEN 1 WHEN freq <= f2 THEN 2
                       WHEN freq <= f3 THEN 3 WHEN freq <= f4 THEN 4
                       ELSE 5 END AS BIGINT) AS f_score,
             CAST(CASE WHEN cents <= m1 THEN 1 WHEN cents <= m2 THEN 2
                       WHEN cents <= m3 THEN 3 WHEN cents <= m4 THEN 4
                       ELSE 5 END AS BIGINT) AS m_score
           FROM rfm, th),
         seg AS (SELECT *,
             CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
                  WHEN f_score >= 4 THEN 'loyal'
                  WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                  WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
                  WHEN r_score <= 2 THEN 'hibernating'
                  ELSE 'regular' END AS segment
           FROM sc)
         SELECT r_score, f_score, m_score, segment,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(cents) AS BIGINT) AS cents,
           CAST(sum(cents) AS BIGINT) // CAST(count(*) AS BIGINT)
             AS arpu_cents
         FROM seg GROUP BY 1, 2, 3, 4
         ORDER BY r_score, f_score, m_score""",
    "q_w_gap_islands" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 86400000000000 AS day FROM events),
         g AS (SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
           FROM ud),
         isl AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
           FROM g GROUP BY 1, 2)
         SELECT len AS streak_days, CAST(count(*) AS BIGINT) AS n_islands,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         FROM isl GROUP BY 1 ORDER BY 1""",
    "q_exp_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         l AS (SELECT g.layer, u.user_id FROM u CROSS JOIN
               (SELECT unnest(range(0, 8)) AS layer) g),
         a AS (SELECT layer,
             ('0x' || substr(md5(CAST(layer AS VARCHAR) || '|'
                || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm
           FROM l),
         g2 AS (SELECT layer,
             CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_arm0,
             CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_arm1
           FROM a GROUP BY layer)
         SELECT layer, n_arm0, n_arm1,
           (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000000
             // (n_arm0 + n_arm1) AS chi2_6,
           CAST(CASE WHEN (n_arm0 - n_arm1) * (n_arm0 - n_arm1) * 1000000
                >= 3841459 * (n_arm0 + n_arm1) THEN 1 ELSE 0 END AS BIGINT)
             AS srm_flag
         FROM g2 ORDER BY layer""",
    "q_exp_two_prop" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
         cv AS (SELECT DISTINCT user_id FROM events
                WHERE event_type = 'purchase'),
         asg AS (SELECT ('0x' || substr(md5('0|'
               || CAST(u.user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
             CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END AS conv
           FROM u LEFT JOIN cv ON u.user_id = cv.user_id),
         cells AS (SELECT
             CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
               AS HUGEINT) AS a,
             CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
               AS HUGEINT) AS b,
             CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
               AS HUGEINT) AS c,
             CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
               AS HUGEINT) AS d
           FROM asg)
         SELECT CAST(a + b AS BIGINT) AS n_arm0,
           CAST(c + d AS BIGINT) AS n_arm1,
           CAST(a AS BIGINT) AS conv0, CAST(c AS BIGINT) AS conv1,
           CAST(CASE WHEN a + b = 0 THEN 0
                ELSE a * 1000000 // (a + b) END AS BIGINT) AS rate0_6,
           CAST(CASE WHEN c + d = 0 THEN 0
                ELSE c * 1000000 // (c + d) END AS BIGINT) AS rate1_6,
           CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
                ELSE (a * d - b * c) * (a * d - b * c)
                  * (a + b + c + d) * 1000000
                  // ((a + b) * (c + d) * (a + c) * (b + d)) END AS BIGINT)
             AS chi2_6,
           CAST(CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) = 0 THEN 0
                WHEN (a * d - b * c) * (a * d - b * c)
                  * (a + b + c + d) * 1000000
                  >= 3841459 * ((a + b) * (c + d) * (a + c) * (b + d))
                THEN 1 ELSE 0 END AS BIGINT) AS sig_flag
         FROM cells""",
    "q_e_pattern_match" ->
      """WITH j AS (SELECT user_id,
             substr(string_agg(substr(event_type, 1, 1), ''
               ORDER BY epoch_ns(ts), event_id), 1, 1024) AS s
           FROM events GROUP BY user_id),
         m AS (SELECT
             len(regexp_extract_all(s, 'vp')) AS m1,
             len(regexp_extract_all(s, 'v[ce]*p')) AS m2,
             len(regexp_extract_all(s, 'ee+')) AS m3
           FROM j),
         a AS (SELECT
             CAST(sum(CASE WHEN m1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS u1,
             CAST(sum(m1) AS BIGINT) AS c1,
             CAST(sum(CASE WHEN m2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS u2,
             CAST(sum(m2) AS BIGINT) AS c2,
             CAST(sum(CASE WHEN m3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS u3,
             CAST(sum(m3) AS BIGINT) AS c3
           FROM m)
         SELECT 'adjacent_view_purchase' AS pattern, u1 AS n_users,
           c1 AS n_matches FROM a
         UNION ALL SELECT 'error_burst', u3, c3 FROM a
         UNION ALL SELECT 'view_reaches_purchase', u2, c2 FROM a
         ORDER BY pattern""",
    "q_e_markov_attribution" ->
      markovAttributionOracle(12, markovCanonicalChannels),
    "q_e_shapley_attribution" ->
      shapleyAttributionOracle(markovCanonicalChannels),
    "q_e_growth_accounting" ->
      """WITH uw AS (SELECT DISTINCT user_id,
             epoch_ns(ts) // 604800000000000 AS week
           FROM events),
         tl AS (SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev,
             lead(week) OVER (PARTITION BY user_id ORDER BY week) AS nxt
           FROM uw),
         mx AS (SELECT max(week) AS max_week FROM uw),
         st AS (SELECT week,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN prev = week - 1 THEN 'retained'
                  ELSE 'resurrected' END AS state
           FROM tl
           UNION ALL
           SELECT week + 1, 'churned' FROM tl, mx
           WHERE (nxt IS NULL OR nxt <> week + 1) AND week < max_week),
         g AS (SELECT week,
             CAST(sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_retained,
             CAST(sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_resurrected,
             CAST(sum(CASE WHEN state = 'churned' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_churned
           FROM st GROUP BY 1)
         SELECT week, n_new, n_retained, n_resurrected, n_churned,
           n_new + n_resurrected - n_churned AS net_growth,
           CASE WHEN n_churned = 0 THEN CAST(-1 AS BIGINT)
                ELSE (n_new + n_resurrected) * 10000 // n_churned END
             AS quick_ratio_bp
         FROM g ORDER BY week""",
    "q_e_window_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS tsn, event_type
           FROM events),
         u1 AS (SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN tsn END) AS t1
           FROM e GROUP BY 1),
         u2 AS (SELECT e.user_id,
             min(CASE WHEN event_type = 'click' AND tsn > t1
               AND tsn <= t1 + 604800000000000 THEN tsn END) AS t2
           FROM e JOIN u1 USING (user_id) GROUP BY 1),
         u3 AS (SELECT e.user_id,
             min(CASE WHEN event_type = 'purchase' AND tsn > t2
               AND tsn <= t2 + 604800000000000 THEN tsn END) AS t3
           FROM e JOIN u2 USING (user_id) GROUP BY 1),
         lv AS (SELECT u1.user_id,
             CASE WHEN t3 IS NOT NULL THEN 3
                  WHEN t2 IS NOT NULL THEN 2
                  WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS level
           FROM u1 JOIN u2 USING (user_id) JOIN u3 USING (user_id)),
         h AS (SELECT level, CAST(count(*) AS BIGINT) AS n_users
           FROM lv GROUP BY 1),
         t AS (SELECT CAST(sum(n_users) AS BIGINT) AS tot FROM h)
         SELECT CAST(level AS BIGINT) AS level, n_users,
           n_users * 10000 // tot AS share_bp
         FROM h, t ORDER BY level""",
    "q_e_heatmap" ->
      """WITH cells AS (SELECT
             ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
             (epoch_ns(ts) // 3600000000000) % 24 AS hour,
             CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2),
         tt AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells)
         SELECT dow, hour, n, n * 10000 // tot AS frac4
         FROM cells, tt ORDER BY dow, hour""",
    "q_exp_power" ->
      """WITH conv AS (SELECT event_type,
             CAST(count(*) AS BIGINT) AS c
           FROM (SELECT DISTINCT event_type, user_id FROM events)
           GROUP BY 1),
         tot AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u,
             max(epoch_ns(ts) // 86400000000000)
               - min(epoch_ns(ts) // 86400000000000) + 1 AS n_days
           FROM events),
         base AS (SELECT event_type, u AS n_users, c AS n_converters,
             c * 1000000 // u AS rate6,
             CASE WHEN c = 0 OR c = u THEN CAST(-1 AS BIGINT)
                  ELSE CAST((CAST(1600 AS HUGEINT) * u * (u - c)
                       + c * c - 1) // (c * c) AS BIGINT) END AS n_per_arm
           FROM conv, tot),
         wt AS (SELECT *,
             CASE WHEN n_per_arm < 0 THEN CAST(-1 AS BIGINT)
                  ELSE 2 * n_per_arm END AS n_total
           FROM base)
         SELECT event_type, n_users, n_converters, rate6, n_per_arm,
           n_total,
           CASE WHEN n_total < 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST((CAST(n_total AS HUGEINT) * tot.n_days + tot.u - 1)
                     // tot.u AS BIGINT) END AS days_to_power
         FROM wt, tot ORDER BY event_type""",
    "q_exp_power_means" ->
      """WITH m AS (SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
               AS HUGEINT) AS sx,
             CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
               * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS HUGEINT)
               AS sxx
           FROM events GROUP BY 1),
         b AS (SELECT event_type, CAST(n AS BIGINT) AS n_obs,
             CAST(sx // n AS BIGINT) AS mean_cents,
             CASE WHEN sx = 0 THEN CAST(-1 AS BIGINT)
                  ELSE CAST((6400 * (n * sxx - sx * sx) + sx * sx - 1)
                       // (sx * sx) AS BIGINT) END AS n_per_arm
           FROM m)
         SELECT event_type, n_obs, mean_cents, n_per_arm,
           CASE WHEN n_per_arm < 0 THEN CAST(-1 AS BIGINT)
                ELSE 2 * n_per_arm END AS n_total
         FROM b ORDER BY event_type""",
    "q_exp_cuped" ->
      """WITH ev AS (SELECT user_id, event_type,
             epoch_ns(ts) // 86400000000000 AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
         mid AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM ev),
         per AS (SELECT user_id,
             CAST(sum(CASE WHEN day < mid THEN cents ELSE 0 END) AS BIGINT)
               AS x,
             CAST(sum(CASE WHEN day >= mid THEN cents ELSE 0 END) AS BIGINT)
               AS y
           FROM ev, mid WHERE event_type = 'purchase' GROUP BY user_id),
         xy AS (SELECT CAST(coalesce(per.x, 0) AS HUGEINT) AS x,
             CAST(coalesce(per.y, 0) AS HUGEINT) AS y
           FROM (SELECT DISTINCT user_id FROM ev) u
           LEFT JOIN per ON u.user_id = per.user_id),
         m AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * x) AS HUGEINT) AS sxx,
             CAST(sum(x * y) AS HUGEINT) AS sxy,
             CAST(sum(y * y) AS HUGEINT) AS syy FROM xy)
         SELECT CAST(n AS BIGINT) AS n_users,
           CAST(sx AS BIGINT) AS pre_cents,
           CAST(sy AS BIGINT) AS post_cents,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                WHEN n * sxy - sx * sy < 0
                THEN -((-(n * sxy - sx * sy)) * 1000000
                       // (n * sxx - sx * sx))
                ELSE (n * sxy - sx * sy) * 1000000
                     // (n * sxx - sx * sx) END AS BIGINT) AS theta6,
           CAST(CASE WHEN n * sxx - sx * sx = 0
                       OR n * syy - sy * sy = 0 THEN 0
                ELSE (abs(n * sxy - sx * sy) * 10000
                       // (n * sxx - sx * sx))
                   * (abs(n * sxy - sx * sy) * 10000
                       // (n * syy - sy * sy)) // 10000
                END AS BIGINT) AS var_red_bp
         FROM m""",
  )
}
