package graft

import java.nio.file.Files

/** Formula pins for the round-12 statistical-test queries. The DuckDB
  * oracle replays the same arithmetic, so (the NextFitSpec lesson) a
  * WRONG formula implemented identically on both sides would still
  * hash-match — these unit fixtures pin each statistic against values
  * computed by hand from the textbook definitions. */
class StatTestsSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def lineitemDir(rows: Seq[(String, Double, Double)]): String = {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def eventsDir(rows: Seq[(Long, Long, String)]): String = {
    // (user_id, epoch-nano ts, event_type)
    import spark.implicits._
    val dir = tmp("graft-stattests")
    rows.toDF("user_id", "ts", "event_type")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("OLS: a perfect line y = 2x + 3 dollars recovers slope 2, " +
      "intercept 300 cents, r² = 1") {
    // y cents = 200·q + 300 = 2·(100·q) + 300 → slope (per centi-qty) 2.
    val dir = lineitemDir(Seq(
      ("A", 1.0, 5.0), ("A", 2.0, 7.0), ("A", 3.0, 9.0), ("A", 4.0, 11.0)))
    val r = SparkEntry.queries("q_stats_ols")(spark, dir).collect().head
    assert(r.getString(0) == "A")
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 2000000L, "slope6")
    assert(r.getLong(3) == 300000000L, "intercept6")
    assert(r.getDouble(4) == 1.0, "r2_4")
  }

  test("Kruskal–Wallis: groups {1,2} {3,4} {5,6} give H = 4.5714 " +
      "(12/42·179/2 − 21, hand-computed), no tie correction") {
    val dir = lineitemDir(Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("N", 3.0, 1.0), ("N", 4.0, 1.0),
      ("R", 5.0, 1.0), ("R", 6.0, 1.0)))
    val r = SparkEntry.queries("q_stats_kruskal")(spark, dir).collect().head
    assert(r.getLong(0) == 6L) // n
    // 2-scaled rank sums: A ranks {1,2}→6, N {3,4}→14, R {5,6}→22.
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((6L, 14L, 22L)))
    assert(r.getDouble(7) == 4.5714, "h4")
    assert(r.getDouble(8) == 4.5714, "hc4 (no ties -> identical)")
  }

  test("ANOVA: groups {1,2,3} {4,5,6} {7,8,9} give F = 27 exactly " +
      "(SSB 54, SSW 6 in quantity units — hand-computed)") {
    val dir = lineitemDir(Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 1.0),
      ("N", 4.0, 1.0), ("N", 5.0, 1.0), ("N", 6.0, 1.0),
      ("R", 7.0, 1.0), ("R", 8.0, 1.0), ("R", 9.0, 1.0)))
    val r = SparkEntry.queries("q_stats_anova")(spark, dir).collect().head
    assert(r.getLong(0) == 9L)
    // centi² units: SSB = 54·10⁴, SSW = 6·10⁴; F is scale-free.
    assert(r.getDouble(4) == 540000.0, "ssb2")
    assert(r.getDouble(5) == 60000.0, "ssw2")
    assert(r.getDouble(6) == 27.0, "f4")
  }

  test("Levene/Brown–Forsythe: mirror-shaped groups have identical " +
      "deviation profiles -> F = 0, dev2 sums 400 centi each") {
    val dir = lineitemDir(Seq(
      ("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 1.0),
      ("N", 4.0, 1.0), ("N", 5.0, 1.0), ("N", 6.0, 1.0),
      ("R", 7.0, 1.0), ("R", 8.0, 1.0), ("R", 9.0, 1.0)))
    val r = SparkEntry.queries("q_stats_levene")(spark, dir).collect().head
    // |2v − med2| per group: 200, 0, 200 (centi) -> sum 400 each.
    assert((r.getLong(4), r.getLong(5), r.getLong(6)) == ((400L, 400L, 400L)))
    assert(r.getDouble(7) == 0.0, "f4")
  }

  test("Welch: equal means give t = 0; df is Welch–Satterthwaite " +
      "16/5 on the {10,20,30} vs {10,10,40} fixture") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    Seq(("BUILDING", 10.0), ("BUILDING", 20.0), ("BUILDING", 30.0),
      ("AUTOMOBILE", 10.0), ("AUTOMOBILE", 10.0), ("AUTOMOBILE", 40.0))
      .toDF("c_mktsegment", "c_acctbal")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/customer.parquet")
    val r = SparkEntry.queries("q_stats_welch")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((3L, 3L)))
    assert(r.getLong(2) == 2000000000L, "mean1_micro (2000 cents)")
    assert(r.getLong(3) == 2000000000L, "mean2_micro")
    assert(r.getDouble(4) == 0.0, "t4")
    // Exact rational df = 16/5 = 3.2; allow the 2 dp floor to land on
    // 3.19 if the double dips below.
    assert(math.abs(r.getDouble(5) - 3.2) <= 0.011, s"df2 ${r.getDouble(5)}")
  }

  test("Hampel: a spike inside a full 7-day window flags (MAD=0 " +
      "degenerate), edge days with partial windows are excluded") {
    val day = 86400000000000L
    // Days 0..8, 1 event/day except day 4 with 10 events.
    val rows = (0 to 8).flatMap { d =>
      val n = if (d == 4) 10 else 1
      (0 until n).map(i => (1L, d * day + i, "view"))
    }
    val out = SparkEntry.queries("q_ts_hampel")(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    // Only days 3..5 carry full windows; med 1, MAD 0 everywhere.
    assert(out == Seq(
      (3L, 1L, 1L, 0L, false),
      (4L, 10L, 1L, 0L, true),
      (5L, 1L, 1L, 0L, false)))
  }

  test("McNemar: unanimous classifiers put every doc in the concordant " +
      "cells — zero discordance, zero statistic, full agreement") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "it is a fine day for running in the field with friends ") * 4
    val bad = "### ### ### ###"
    val docs = (0L until 5L).map(i => (i, good)) ++
      (5L until 8L).map(i => (i, bad))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_llm_mcnemar")(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((8L, 5L, 0L, 0L, 3L)))
    assert(r.getLong(5) == 1000000L, "agree_micro")
    assert(r.getLong(6) == 0L, "mcnemar_micro")
  }

  test("Cohen's kappa: a quality-only disagreeing block yields the " +
      "hand-computed marginal arithmetic (kappa = 30/50)") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "it is a fine day for running in the field with friends ") * 4
    val bad = "### ### ### ###"
    // 47 words (< 50 ⇒ gopher fails) but 206 clean chars in [200, 2000]
    // with heavy stopwords ⇒ quality ≈ 0.93 passes: a quality-only doc.
    val shortClean =
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 3)
        .trim + " sunny skies"
    val docs = (0L until 5L).map(i => (i, good)) ++
      (5L until 8L).map(i => (i, bad)) ++
      (8L until 10L).map(i => (i, shortClean))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_stats_kappa")(spark, dir).collect().head
    // n=10, g_pos=5, q_pos=7, agree=8 → p_o = 0.8;
    // pe_num = 5·7 + 5·3 = 50 → p_e = 0.5; κ = (80−50)/(100−50) = 0.6.
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((10L, 5L, 7L, 8L)))
    assert(r.getLong(4) == 800000L, "po_micro")
    assert(r.getLong(5) == 500000L, "pe_micro")
    assert(r.getLong(6) == 600000L, "kappa_micro")
  }

  test("Mahalanobis: the joint outlier on a correlated cloud outranks " +
      "both marginal extremes; hand-computed 4dp scores") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    // Four points on the y = x diagonal plus (5, 1): normal on each
    // axis alone, anomalous jointly.
    Seq((1L, 1, 1.0, 1.0), (2L, 1, 2.0, 2.0), (3L, 1, 3.0, 3.0),
        (4L, 1, 4.0, 4.0), (5L, 1, 5.0, 1.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_stats_mahalanobis")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (5L, 100L, 3.2), (1L, 100L, 2.0), (4L, 400L, 2.0),
      (2L, 200L, 0.4), (3L, 300L, 0.4)))
  }

  test("Kaplan-Meier: censored users shrink the risk set without " +
      "stepping S; hand-computed truncating product-limit curve") {
    val day = 86400000000000L
    // (user, first..events): u1/u2 convert at T=2, u4 at T=4, u6 at T=0;
    // u3 (followed 5 days) and u5 (1 day) never purchase -> censored.
    val rows = Seq(
      (1L, 0L * day, "view"), (1L, 2L * day, "purchase"),
      (2L, 0L * day, "view"), (2L, 2L * day, "purchase"),
      (2L, 5L * day, "purchase"),
      (3L, 1L * day, "view"), (3L, 6L * day, "view"),
      (4L, 0L * day, "view"), (4L, 4L * day, "purchase"),
      (5L, 2L * day, "view"), (5L, 3L * day, "view"),
      (6L, 0L * day + 1L, "purchase"))
    val out = SparkEntry.queries("q_e_survival")(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // t=0: 6 at risk, 1 event -> 1e6·5//6 = 833333; t=1 censor-only (u5,
    // no row, risk 6->4 via n_at at t=0,1); t=2: 4 at risk, 2 events ->
    // 833333·2//4 = 416666; t=4: 2 at risk, 1 event -> 208333.
    assert(out == Seq(
      (0L, 6L, 1L, 0L, 833333L),
      (2L, 4L, 2L, 0L, 416666L),
      (4L, 2L, 1L, 0L, 208333L)))
  }

  test("CCF: purchases planted as views shifted 2 days give r(2) = 1 " +
      "exactly; off lags match an independent Python fold") {
    val day = 86400000000000L
    val views = Seq(1, 2, 4, 8, 5, 3, 7, 6, 9)
    // views on days 0..8; purchases on day d = views(d-2) for d = 2..10.
    val rows =
      views.zipWithIndex.flatMap { case (v, d) =>
        (0 until v).map(i => (1L, d * day + i, "view")) } ++
      views.zipWithIndex.flatMap { case (v, d) =>
        (0 until v).map(i => (1L, (d + 2) * day + i, "purchase")) }
    val out = SparkEntry.queries("q_ts_ccf")(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // lag → (n overlapping days, floored-4dp Pearson); lag 4 is an exact
    // zero-variance-free 0, lag 2 the planted perfect alignment.
    assert(out.toSeq == Seq(
      (0L, 11L, -0.0406), (1L, 10L, 0.1393), (2L, 9L, 1.0),
      (3L, 8L, 0.3809), (4L, 7L, 0.0), (5L, 6L, -0.0995),
      (6L, 5L, 0.4898), (7L, 4L, 0.8291)))
  }

  test("Holt–Winters: the query state equals a scalar reference fold " +
      "of the textbook recurrence (incl. negative seasonal offsets)") {
    val day = 86400000000000L
    val counts = Seq(1, 9, 5, 3, 7, 2, 6, 4, 10, 5, 8)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (1L, d * day + i, "view"))
    }
    val r = SparkEntry.queries("q_ts_holt_winters")(spark, eventsDir(rows))
      .collect().head
    // Scalar reference: the same init + coupled truncating updates.
    def tdiv(a: Long, b: Long): Long = a / b // JVM Long / truncates
    val vals = counts.map(_ * 10000L)
    val l0 = tdiv(vals.take(7).sum, 7)
    var (l, b) = (l0, 0L)
    val se = vals.take(7).map(_ - l0).toArray
    for (t <- 8 to vals.length) {
      val x = vals(t - 1); val pos = (t - 1) % 7
      val l2 = tdiv(x - se(pos) + 3 * (l + b), 4)
      b = tdiv(l2 - l + 3 * b, 4)
      se(pos) = tdiv(x - l2 + 3 * se(pos), 4)
      l = l2
    }
    val n = vals.length.toLong
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == l, "level")
    assert(r.getLong(2) == b, "trend")
    assert(r.getLong(3) == se((n % 7).toInt), "next seasonal")
    assert(r.getLong(4) == l + b + se((n % 7).toInt), "forecast")
    (0 until 7).foreach(i =>
      assert(r.getLong(5 + i) == se(i), s"seasonal slot ${i + 1}"))
  }

  test("PSI: identical even/odd cohorts score exactly 0") {
    val day = 86400000000000L
    // Users 0 (even) and 1 (odd) replay the same event stream.
    val rows = (0 until 20).flatMap { i =>
      Seq((0L, i * day, if (i % 2 == 0) "view" else "click"),
        (1L, i * day, if (i % 2 == 0) "view" else "click"))
    }
    val r = SparkEntry.queries("q_stats_psi")(spark, eventsDir(rows))
      .collect().head
    assert(r.getLong(3) == 0L, "psi8")
  }

  test("Holt: a perfectly linear series settles on its own slope and " +
      "forecasts one step ahead exactly") {
    val day = 86400000000000L
    // Counts 1,2,3,4,5 per day -> units 10000..50000, slope 10000/day.
    val rows = (0 until 5).flatMap(d =>
      (0 to d).map(i => (1L, d * day + i, "view")))
    val r = SparkEntry.queries("q_ts_holt")(spark, eventsDir(rows))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((5L, 50000L, 10000L, 60000L)))
  }

  test("self-BLEU: clones of the panel text score 10000, disjoint " +
      "vocabulary scores 0") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // Panel membership depends ONLY on md5(doc_id) — compute the one
    // non-panel id to plant the disjoint-vocabulary document there.
    val ids = (0L until 25L).toSeq
    val refIds = ids.sortBy(id => md5hex(id.toString)).take(20).toSet
    val oddOut = ids.filterNot(refIds).head
    import spark.implicits._
    val dir = tmp("graft-stattests")
    ids.map(id => (id,
        if (id == oddOut) "x y z" else "a b c d"))
      .toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_llm_self_bleu")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 5)
    // The disjoint doc: no unigram matches -> short-circuit to 0.
    assert(out(oddOut) == ((3L, 0L, 0L, 0L)))
    // Every clone: full clipped matches, c == r -> BP 0, p1 = p2 = 1.
    (out - oddOut).values.foreach(v => assert(v == ((4L, 4L, 3L, 10000L))))
  }

  test("PACF: Durbin-Levinson on a crafted 15-day series matches the " +
      "independent Python reference fold at all 7 lags") {
    val day = 86400000000000L
    val counts = Seq(5, 9, 3, 7, 6, 2, 8, 4, 10, 6, 7, 3, 9, 5, 8)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (1L, d * day + i, "view")) }
    val out = SparkEntry.queries("q_ts_pacf")(spark, eventsDir(rows))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq(
      (1L, -0.6229), (2L, 0.0315), (3L, -0.0334), (4L, -0.2882),
      (5L, -0.141), (6L, 0.1706), (7L, 0.0692)))
  }

  test("PACF: sub-8-day and constant series yield no rows") {
    val day = 86400000000000L
    val short = (0 until 7).map(d => (1L, d * day, "view"))
    assert(SparkEntry.queries("q_ts_pacf")(spark, eventsDir(short))
      .count() == 0)
    val const = (0 until 10).map(d => (1L, d * day, "view"))
    assert(SparkEntry.queries("q_ts_pacf")(spark, eventsDir(const))
      .count() == 0)
  }

  test("AUC: perfectly separating scores give exactly 10^6 via the " +
      "2-scaled mid-rank U identity") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "it is a fine day for running in the field with friends ") * 4
    val bad = "### ### ### ###"
    val docs = (0L until 5L).map(i => (i, good)) ++
      (5L until 8L).map(i => (i, bad))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_llm_auc")(spark, dir).collect().head
    // All 5 positives share one (high) score, all 3 negatives one (low)
    // score: mid-ranks 2·(4+..+8) = 60 → U = 15 = n₁n₀ → AUC = 1.
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((8L, 5L, 3L, 60L)))
    assert(r.getLong(4) == 1000000L, "auc_micro")
  }

  test("ROUGE-2: clone candidates score full F1 against the panel, a " +
      "partial overlap lands on exact rational micro scores") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ids = (0L until 25L).toSeq
    val refIds = ids.sortBy(id => md5hex(id.toString)).take(20).toSet
    val nonPanel = ids.filterNot(refIds)
    val (disjoint, partial) = (nonPanel.head, nonPanel(1))
    val minRef = refIds.min
    import spark.implicits._
    val dir = tmp("graft-stattests")
    ids.map(id => (id,
        if (id == disjoint) "x y z"
        else if (id == partial) "a b x"
        else "a b c d"))
      .toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_llm_rouge2")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toMap
    assert(out.size == 5)
    // Disjoint: zero overlap everywhere, best ref falls back to min id.
    assert(out(disjoint) == ((minRef, 0L, 2L, 3L, 0L, 0L, 0L)))
    // Partial "a b x": 1 of 2 cand bigrams, 1 of 3 ref bigrams →
    // R = 1/3, P = 1/2, F1 = 2/5 exactly.
    assert(out(partial) == ((minRef, 1L, 2L, 3L, 333333L, 500000L,
      400000L)))
    // Clones: all 3 bigrams clip fully → R = P = F1 = 1.
    (out - disjoint - partial).values.foreach(v =>
      assert(v == ((minRef, 3L, 3L, 3L, 1000000L, 1000000L, 1000000L))))
  }

  test("WCC histogram: two crafted co-purchase components land in the " +
      "right size buckets with min-id checksums") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    // Orders 1:{4,8}, 2:{8,12} chain into component {4,8,12} (min 4);
    // order 3:{16,20} is its own pair component (min 16).
    Seq((1L, 4L), (1L, 8L), (2L, 8L), (2L, 12L), (3L, 16L), (3L, 20L))
      .toDF("l_orderkey", "l_partkey").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_wcc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((2L, 1L, 16L), (3L, 1L, 4L)))
  }

  test("silhouette: two tight far-apart groups (both holding seed " +
      "slots) score a perfect 10^6 in both clusters") {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // Split by md5 rank parity so the bottom-8 seed slots are shared
    // 4/4 between the groups (rank 1 -> group A => cluster cid 0 is A,
    // rank 2 -> B => cid 1), making the output cids deterministic.
    val ids = (0L until 60L).toSeq
    val ranked = ids.sortBy(id => md5hex(id.toString))
    val groupA = ranked.zipWithIndex.collect {
      case (id, i) if i % 2 == 0 => id
    }.toSet
    import spark.implicits._
    val dir = tmp("graft-stattests")
    ids.map { id =>
      val v = if (groupA(id)) 0.0f else 1.0f
      (id, Seq.fill(64)(v))
    }.toDF("vec_id", "embedding").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_llm_silhouette")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // Intra-cluster distance 0, inter 64·(10^6)² -> s = 10^6 exactly.
    assert(out == Seq((0L, 30L, 1000000L), (1L, 30L, 1000000L)))
  }

  test("Holt backtest: hand-walked one-step errors — sMAPE uses the " +
      "PRE-update forecast, MASE the same-window naive denominator") {
    // Daily counts 1,2,3,5 -> units 10000,20000,30000,50000.
    // Init l=20000, b=10000. t=3: fc=30000, e=0; update -> l=30000,
    // b=10000. t=4: fc=40000, e=10000; smape step = 2*10000*10^4 //
    // 90000 = 2222. sae=10000, smape4 = 2222//2 = 1111,
    // naive = 10000+20000 = 30000 -> mase4 = 10^8 // 30000 = 3333.
    val day = 86400000000000L
    val rows = Seq((1L, 0L, "view"),
      (2L, day, "view"), (3L, day + 1, "view"),
      (4L, 2 * day, "view"), (5L, 2 * day + 1, "view"),
      (6L, 2 * day + 2, "view"),
      (7L, 3 * day, "view"), (8L, 3 * day + 1, "view"),
      (9L, 3 * day + 2, "view"), (10L, 3 * day + 3, "view"),
      (11L, 3 * day + 4, "view"))
    val r = SparkEntry.queries("q_ts_backtest")(spark, eventsDir(rows))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 2L, 10000L, 1111L, 3333L)))
  }

  test("conformal: hand-walked residual sequence — chronological 2/3 " +
      "split, rank-3 calibration quantile, held-out coverage") {
    // Daily counts 1,2,3,5,3,2,4 -> one-step |residuals| (PRE-update
    // forecasts) = [0, 10000, 23125, 36522, 14287]. m=5, c=3,
    // k=min(ceil(0.9*4),3)=3 -> qhat = 3rd smallest of [0,10000,23125]
    // = 23125; test [36522, 14287] -> 1 of 2 covered -> 5000.
    val day = 86400000000000L
    val counts = Seq(1, 2, 3, 5, 3, 2, 4)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => (d * 100L + j, d * day + j, "view"))
    }.map { case (u, ts, t) => (u, ts, t) }
    val r = SparkEntry.queries("q_ts_conformal")(spark, eventsDir(rows))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((7L, 3L, 2L, 23125L, 5000L)))
  }

  test("calibration: bin/conf/acc/gap/ECE arithmetic matches an " +
      "independent fold over the per-doc kernel scores") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor}
    val dir = tmp("graft-stattests")
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "it is a fine day for running in the field with friends ") * 4
    val bad = "### ### ### ###"
    val shortClean =
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 3)
        .trim + " sunny skies"
    val docs = (0L until 5L).map(i => (i, good)) ++
      (5L until 8L).map(i => (i, bad)) ++
      (8L until 10L).map(i => (i, shortClean))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Independent per-doc scores straight off the kernels (pinned
    // elsewhere), folded by the textbook ECE definition in plain Scala.
    val perDoc = docs.toDF("doc_id", "text").select(
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * 10000
          + 0.5).cast("long"),
        graft.llm.TextAnalysis.gopherPass(col("text")))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val expected = perDoc.groupBy { case (s4, _) => math.min(s4 / 1000, 9L) }
      .map { case (bin, xs) =>
        val n = xs.length.toLong
        val conf4 = xs.map(_._1).sum / n
        val acc4 = xs.count(_._2) * 10000L / n
        (bin, n, conf4, acc4, math.abs(acc4 - conf4))
      }.toSeq.sortBy(_._1)
    val ece4 = expected.map(e => e._2 * e._5).sum / expected.map(_._2).sum
    val out = SparkEntry.queries("q_llm_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected.map(e => (e._1, e._2, e._3, e._4, e._5, ece4)))
    assert(out.map(_._2).sum == 10L, "every doc lands in exactly one bin")
    assert(perDoc.count(_._2) == 5L, "fixture: exactly the good docs pass")
  }

  test("signed-rank: hand-computed mid-ranks over a tied series with " +
      "a dropped zero difference") {
    // Per-day (views, purchases): d = [2, 2, -1, 3, 0] -> zero drops,
    // n=4; |d| mid-ranks: 1 -> 1, {2, 2} -> 2.5 each, 3 -> 4.
    // W+ = 2.5 + 2.5 + 4 = 9 (W2 = 18); z = (9 - 5)/sqrt(7.5) =
    // 1.46059... -> z4 = 14605.
    val day = 86400000000000L
    def mk(d: Int, v: Int, p: Int) =
      (0 until v).map(j => (d * 100L + j, d * day + j, "view")) ++
        (0 until p).map(j => (d * 100L + 50 + j, d * day + 50 + j,
          "purchase"))
    val rows = mk(0, 3, 1) ++ mk(1, 4, 2) ++ mk(2, 1, 2) ++
      mk(3, 5, 2) ++ mk(4, 2, 2)
    val r = SparkEntry.queries("q_stats_signed_rank")(
      spark, eventsDir(rows)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      == ((4L, 18L, 14605L)))
  }

  test("gains: cumulative capture and lift match an independent fold " +
      "over the per-doc kernel scores") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor}
    val dir = tmp("graft-stattests")
    val good = ("the quick brown fox jumps over the lazy dog and " +
      "it is a fine day for running in the field with friends ") * 4
    val bad = "### ### ### ###"
    val docs = (0L until 5L).map(i => (i, good)) ++
      (5L until 8L).map(i => (i, bad))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val perDoc = docs.toDF("doc_id", "text").select(
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * 10000
          + 0.5).cast("long"),
        graft.llm.TextAnalysis.gopherPass(col("text")))
      .collect().map(r => (math.min(r.getLong(0) / 1000, 9L),
        r.getBoolean(1)))
    val byBand = perDoc.groupBy(_._1).map { case (b, xs) =>
      (b, xs.length.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(-_._1)
    val (totN, totPos) = (byBand.map(_._2).sum, byBand.map(_._3).sum)
    var (cn, cp) = (0L, 0L)
    val expected = byBand.map { case (b, n, pos) =>
      cn += n; cp += pos
      val depth4 = cn * 10000 / totN
      val capture4 = if (totPos == 0) 0L else cp * 10000 / totPos
      val lift4 = if (capture4 == 0) 0L else capture4 * 10000 / depth4
      (b, n, pos, cn, cp, depth4, capture4, lift4)
    }
    val out = SparkEntry.queries("q_llm_gains")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(out == expected)
    assert(out.last._7 == 10000L, "full depth captures all positives")
  }

  test("isotonic: a planted violation (high-band gopher-failures above " +
      "a passing mid band) forces a PAV merge that matches an " +
      "independent fold") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, floor}
    val dir = tmp("graft-stattests")
    // Mid-quality text that PASSES gopher (300 words, clean, stopworded)
    // but scores below the shortClean docs (chars > 2000 + digit chars
    // drag the quality factors), so a higher band holds a LOWER pass
    // rate -> adjacent violation -> merge.
    val midQuality = (1 to 300).map(i =>
      if (i % 10 == 0) "the" else s"wordy$i").mkString(" ")
    val shortClean =
      ("the quick brown fox jumps over the lazy dog and it is a fine day " * 3)
        .trim + " sunny skies"
    val bad = "### ### ### ###"
    val docs = (0L until 5L).map(i => (i, midQuality)) ++
      (5L until 7L).map(i => (i, shortClean)) ++
      (7L until 10L).map(i => (i, bad))
    docs.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val perDoc = docs.toDF("doc_id", "text").select(
        floor(graft.llm.TextAnalysis.qualityScore(col("text")) * 10000
          + 0.5).cast("long"),
        graft.llm.TextAnalysis.gopherPass(col("text")))
      .collect().map(r => (math.min(r.getLong(0) / 1000, 9L),
        r.getBoolean(1)))
    val bands = perDoc.groupBy(_._1).map { case (b, xs) =>
      (b, b, xs.length.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    assert(bands.indices.dropRight(1).exists(i =>
        bands(i)._4 * bands(i + 1)._3 > bands(i + 1)._4 * bands(i)._3),
      "fixture must plant an adjacent violation")
    // Independent PAV fold (first-violation merge order).
    val pools = scala.collection.mutable.ArrayBuffer(bands: _*)
    var go = true
    while (go) {
      go = false
      pools.indices.dropRight(1).find(i =>
        pools(i)._4 * pools(i + 1)._3 > pools(i + 1)._4 * pools(i)._3)
        .foreach { i =>
          pools(i) = (pools(i)._1, pools(i + 1)._2,
            pools(i)._3 + pools(i + 1)._3, pools(i)._4 + pools(i + 1)._4)
          pools.remove(i + 1); go = true
        }
    }
    val expected = pools.toSeq.zipWithIndex.map { case ((lo, hi, n, p), i) =>
      (i + 1L, lo, hi, n, p, p * 10000L / n) }
    val out = SparkEntry.queries("q_llm_isotonic")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == expected)
    assert(out.size < bands.size, "the violation must merge pools")
    assert(out.map(_._6) == out.map(_._6).sorted, "fit is monotone")
  }

  test("split leakage: a planted train->val clone is the only leak; " +
      "counts and frac are exact") {
    import spark.implicits._
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def isTrain(id: Long): Boolean = md5hex(id.toString) < "cccccccc"
    val ids = (0L until 40L)
    val train = ids.filter(isTrain).take(2)
    val vals = ids.filterNot(isTrain).take(2)
    assert(train.size == 2 && vals.size == 2, "fixture needs both splits")
    // Exactly 5 tokens -> exactly ONE 5-gram per doc; the clone is the
    // only cross-split gram.
    val dir = tmp("graft-stattests")
    Seq((train(0), "alpha beta gamma delta epsilon"),
        (train(1), "zeta eta theta iota kappa"),
        (vals(0), "alpha beta gamma delta epsilon"),   // clone -> leaks
        (vals(1), "lambda mu nu xi omicron"))
      .toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_llm_split_leakage")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 1L, 1L, 5000L)))
  }

  test("ABC classification: hand-computed 70/20/10 revenue split lands " +
      "exactly on the A/B/C boundaries") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    Seq((1L, "Brand#A"), (2L, "Brand#B"), (3L, "Brand#C"))
      .toDF("p_partkey", "p_brand").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    Seq((1L, 70.0), (2L, 20.0), (3L, 10.0))
      .toDF("l_partkey", "l_extendedprice").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_agg_abc")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(out == Seq(
      ("Brand#A", 7000L, 7000L, 7000L, "A"),
      ("Brand#B", 2000L, 2000L, 9000L, "B"),
      ("Brand#C", 1000L, 1000L, 10000L, "C")))
  }

  test("exact median: lower-median convention on even counts and " +
      "duplicate values") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
        ("B", 5.0), ("B", 5.0), ("B", 7.0))
      .toDF("l_returnflag", "l_extendedprice").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_agg_exact_median")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(out == Seq(("A", 4L, 200L), ("B", 3L, 500L)))
  }

  test("markov stationary: two-state chain hand-walked through all " +
      "eight truncating iterations") {
    // view->purchase always; purchase->view / purchase->purchase split
    // 1:1. True stationary is (1/3, 2/3); the 8-round truncating
    // iteration from uniform lands at (333984, 666015) exactly.
    import spark.implicits._
    val day = 86400000000000L
    val rows = Seq(
      (1L, 0L, "view"), (1L, 1L, "purchase"), (1L, 2L, "view"),
      (2L, day, "view"), (2L, day + 1, "purchase"),
      (2L, day + 2, "purchase"))
    val dir = tmp("graft-stattests")
    rows.zipWithIndex.map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
      .toDF("event_id", "user_id", "ts", "event_type").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_e_markov_stationary")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("purchase", 666015L), ("view", 333984L)))
  }

  test("trigram paths: hand-counted order-2 sequences with exact fracs") {
    import spark.implicits._
    val day = 86400000000000L
    // u1: v,v,p,v -> (v,v,p),(v,p,v); u2: v,v,p -> (v,v,p).
    val rows = Seq(
      (1L, 0L, "view"), (1L, 1L, "view"), (1L, 2L, "purchase"),
      (1L, 3L, "view"),
      (2L, day, "view"), (2L, day + 1, "view"), (2L, day + 2, "purchase"))
    val dir = tmp("graft-stattests")
    rows.zipWithIndex.map { case ((u, ts, t), i) => (i.toLong, u, ts, t) }
      .toDF("event_id", "user_id", "ts", "event_type").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_e_trigrams")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      ("view", "view", "purchase", 2L, 6666L),
      ("view", "purchase", "view", 1L, 3333L)))
  }

  test("cohort revenue: purchases land in (cohort, weeks-since) cells " +
      "with exact cents and truncating ARPU") {
    import spark.implicits._
    val wk = 604800000000000L
    // Cohort wk0 = {u1, u2} (u2 never buys); wk1 = {u3}.
    val rows = Seq(
      (1L, 0L, "view", 0.0), (1L, 1L, "purchase", 10.0),
      (1L, wk + 2, "purchase", 5.5),
      (2L, 3L, "view", 0.0),
      (3L, wk, "view", 0.0), (3L, wk + 1, "purchase", 3.25))
    val dir = tmp("graft-stattests")
    rows.zipWithIndex.map { case ((u, ts, t, v), i) =>
        (i.toLong, u, ts, t, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_e_cohort_revenue")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (0L, 0L, 1L, 1000L, 500L),   // 10.00 over cohort of 2
      (0L, 1L, 1L, 550L, 275L),
      (1L, 0L, 1L, 325L, 325L)))
  }

  test("degree distribution: hand-computed histogram with top-down " +
      "cumulative hub counts") {
    import spark.implicits._
    val dir = tmp("graft-stattests")
    // Baskets {1,2}, {1,3}, {2,3,4} -> edges (1,2),(1,3),(2,3),(2,4),
    // (3,4); degrees 1:2, 2:3, 3:3, 4:2 -> hist d3:2 nodes, d2:2.
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 3L),
        (12L, 2L), (12L, 3L), (12L, 4L))
      .toDF("l_orderkey", "l_partkey").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_graph_degree_dist")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(out == Seq((3L, 2L, 5000L, 2L), (2L, 2L, 5000L, 4L)))
  }

  test("theta sketch: identical sets make union and intersection " +
      "estimates coincide, with 63 sketch hashes under theta") {
    val day = 86400000000000L
    // 80 distinct (user, day0) pairs in BOTH sets (>= k = 64).
    val rows = (0L until 80L).flatMap(u =>
      Seq((u, day + u, "view"), (u, day + u, "purchase")))
    val r = SparkEntry.queries("q_sketch_theta")(spark, eventsDir(rows))
      .collect().head
    val (ta, tb, tu) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ta == tb && tb == tu, "identical sets -> identical thetas")
    assert(r.getLong(7) == 63L, "inter_count: all sketch hashes below k-th")
    assert(r.getLong(4) == r.getLong(8), "union_est == inter_est")
    assert(r.getLong(5) == 80L && r.getLong(9) == 80L, "exact counts")
  }
}
