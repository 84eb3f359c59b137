package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.llm.TextAnalysis
import graft.pipeline.Ingestor
import graft.transform.Transformers

/** Property tests the reference lacks (SURVEY.md §5 plan): totality,
  * idempotence, and round-trip invariants, each materialized as ONE Spark
  * job over a generated batch (fixed seed — reproducible). */
class PropertySpec extends SparkSpecBase {

  /** Deterministic sample of n values from a generator. */
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val anyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr, Gen.asciiPrintableStr,
    Gen.oneOf("", " ", "*", "NULL", "N/A", "nan", "NaN", "None", "1,2,3", "-",
      "1e5", "0x1A", ".", "..", "  123  ", "12.34.56"))

  test("parse_numeric is total: every string maps to null or a double, never throws") {
    import spark.implicits._
    val inputs = sample(anyString, 300)
    val out = inputs.toDF("v")
      .select(col("v"), Transformers.parseNumeric(col("v")).as("p"))
      .collect()
    assert(out.length == 300) // no exception = pass; values null or double
    out.foreach(r => assert(r.get(1) == null || r.get(1).isInstanceOf[Double]))
  }

  test("parse_numeric round-trips doubles formatted with thousands separators") {
    import spark.implicits._
    val nums = sample(Gen.chooseNum(-999999999L, 999999999L), 100)
    val formatted = nums.map(n => {
      val s = math.abs(n).toString.reverse.grouped(3).mkString(",").reverse
      (if (n < 0) "-" + s else s, n)
    })
    val out = formatted.toDF("v", "expected")
      .select(Transformers.parseNumeric(col("v")).as("p"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getDouble(0) == r.getLong(1).toDouble))
  }

  test("clean_code is idempotent") {
    import spark.implicits._
    val inputs = sample(anyString, 200)
    val out = inputs.toDF("v")
      .select(Transformers.cleanCode(col("v")).as("once"),
        Transformers.cleanCode(Transformers.cleanCode(col("v"))).as("twice"))
      .collect()
    out.foreach(r => assert(r.get(0) == r.get(1)))
  }

  test("parse_date round-trips random dates through all five formats") {
    import spark.implicits._
    val days = sample(Gen.chooseNum(0, 20000), 60) // 1970..2024
    val fmts = Seq("yyyyMMdd", "MM/dd/yyyy", "yyyy-MM-dd", "yyyy/MM/dd", "MM-dd-yyyy")
    val df = days.toDF("d")
      .select(date_add(lit("1970-01-01").cast("date"), col("d")).as("date"))
    for (f <- fmts) {
      val bad = df.select(col("date"),
        Transformers.parseDate(date_format(col("date"), f)).as("back"))
        .filter(!(col("back") <=> col("date"))).count()
      assert(bad == 0, s"format $f")
    }
  }

  test("parse_integer truncates toward zero for arbitrary doubles") {
    import spark.implicits._
    val ds = sample(Gen.chooseNum(-1e9, 1e9), 150)
    val out = ds.toDF("d")
      .select(col("d"), Transformers.parseInteger(format_number(col("d"), 6)).as("p"))
      .collect()
    out.foreach { r =>
      val expected = r.getDouble(0).toLong // Scala double->long truncates toward zero
      assert(r.getLong(1) == expected, s"input ${r.getDouble(0)}")
    }
  }

  test("dedup is idempotent and never drops null-key rows") {
    import spark.implicits._
    val rows = sample(for {
      k <- Gen.option(Gen.chooseNum(0L, 20L))
      v <- Gen.alphaStr
    } yield (k, v), 300).zipWithIndex.map { case ((k, v), i) =>
      (k.map(java.lang.Long.valueOf).orNull, v, i.toLong)
    }
    val df = rows.toDF("k", "v", "_row_number")
    val (once, _) = Ingestor.dedupFirstWins(df, Seq("k"))
    val (twice, dups2) = Ingestor.dedupFirstWins(once, Seq("k"))
    assert(once.count() == twice.count())
    assert(dups2.count() == 0)
    val nullIn = df.filter(col("k").isNull).count()
    assert(once.filter(col("k").isNull).count() == nullIn)
  }

  test("quality score stays within [0,1] for arbitrary text") {
    import spark.implicits._
    val inputs = sample(anyString, 200)
    val out = inputs.toDF("v")
      .select(TextAnalysis.qualityScore(col("v")).as("q")).collect()
    out.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
  }

  test("pii scrub is idempotent and leaves no matches behind") {
    import spark.implicits._
    val inputs = sample(anyString, 100) ++ Seq(
      "mail a.b@c.de and x@y.io", "go to https://a.b/c now", "call 123-456-7890",
      "nested http://u:p@h.com/x@y", "edge 999-999-9999.")
    val df = inputs.toDF("v").select(
      TextAnalysis.scrubPii(col("v")).as("once"))
      .select(col("once"), TextAnalysis.scrubPii(col("once")).as("twice"),
        TextAnalysis.piiCount(col("once"), TextAnalysis.EmailRe).as("emails_left"),
        TextAnalysis.piiCount(col("once"), TextAnalysis.PhoneRe).as("phones_left"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1)) // idempotent
      assert(r.getInt(2) == 0 && r.getInt(3) == 0)
    }
  }

  test("hash split respects the requested fraction ordering") {
    // more training fraction -> superset of training membership
    val ids = (0L until 500L)
    def trainSet(f: Double) = {
      val th = graft.llm.Sampling.hexThreshold(f)
      ids.filter { id =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes).map("%02x".format(_)).mkString < th
      }.toSet
    }
    val t5 = trainSet(0.5); val t8 = trainSet(0.8)
    assert(t5.subsetOf(t8))
    assert(t8.size > t5.size)
  }

  test("fingerprint is invariant under case and extra whitespace") {
    import spark.implicits._
    val words = sample(Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      .map(_.take(8).mkString(" ")), 80).filter(_.nonEmpty)
    val df = words.toDF("v").select(
      TextAnalysis.fingerprint(col("v")).as("a"),
      TextAnalysis.fingerprint(upper(col("v"))).as("b"),
      TextAnalysis.fingerprint(regexp_replace(col("v"), " ", "   ")).as("c"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getString(0) == r.getString(2))
    }
  }

  test("span dedup: every surviving span value is globally unique, kept " +
      "text is a subsequence of the original") {
    import spark.implicits._
    // random word soup with heavy cross-doc repetition (tiny vocabulary)
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
    val doc = Gen.listOfN(17, word).map(_.mkString(" "))
    val corpus = sample(doc, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = graft.llm.Dedup.dedupSpans(corpus, "doc_id", "text", spanTokens = 4)
    val kept = out.collect().map(r =>
      r.getLong(0) -> r.getAs[String]("dedup_text")).toMap
    // contract 1: re-spanning the SURVIVORS yields all-distinct spans
    // (first-occurrence-wins means no span value can survive twice)
    val allSpans = kept.values.flatMap(_.split(" ").grouped(4).map(_.mkString(" "))).toSeq
    // regrouping survivors shifts boundaries, so check the operator's own
    // accounting instead: total kept spans == distinct spans kept
    val spanRows = out.agg(sum(col("n_spans_kept"))).head.getLong(0)
    val originalSpans = corpus.collect().flatMap(
      _.getString(1).split(" ").grouped(4).map(_.mkString(" ")))
    assert(spanRows == originalSpans.distinct.length.toLong,
      s"kept $spanRows spans but corpus has ${originalSpans.distinct.length} distinct")
    // contract 2: each doc's kept text is a subsequence of its original spans
    val originals = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    kept.foreach { case (id, text) =>
      val origSpans = originals(id).split(" ").grouped(4).map(_.mkString(" ")).toSeq
      val keptTokens = text.split(" ").toSeq
      // kept text = concatenation of a subset of original spans, in order
      var rest = keptTokens
      origSpans.foreach { sp =>
        val spToks = sp.split(" ").toSeq
        if (rest.startsWith(spToks)) rest = rest.drop(spToks.length)
      }
      assert(rest.isEmpty, s"doc $id kept text is not an ordered span subset")
    }
    assert(allSpans.nonEmpty)
  }

  test("bigram LM: every score is strictly negative and total over input") {
    import spark.implicits._
    val word = Gen.oneOf("x", "y", "zz", "w w", "", "  ")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val corpus = sample(doc, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = graft.llm.NgramLm.fit(corpus, "text")
    val out = graft.llm.NgramLm.scoreAvgLogProb(corpus, "doc_id", "text", model)
      .collect()
    assert(out.length == 40) // total: no doc dropped, nothing throws
    // c2 <= c1(context) always, so (c2+1)/(c1+V) < 1 whenever V >= 2
    if (model.vocabSize >= 2)
      out.foreach(r => assert(r.getAs[Double]("avg_logp") < 0.0))
  }

  test("fixed chunking: covering, stride-spaced, never a redundant tail") {
    import spark.implicits._
    // Random doc lengths including all the boundary shapes around one
    // window (0, 1, overlap, size-1, size, size+1, multiples of stride).
    val lens = sample(Gen.chooseNum(0, 90), 60).distinct
    val docs = lens.zipWithIndex
      .map { case (n, i) => (i.toLong, (0 until n).map(j => s"t$j").mkString(" ")) }
      .toDF("doc_id", "text")
    val out = graft.llm.Pack.fixedChunks(docs, "doc_id", "text",
        chunkSize = 16, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt))
      .groupBy(_._1)
    lens.zipWithIndex.foreach { case (n, i) =>
      val cs = out(i.toLong).sortBy(_._2)
      // chunk_idx is dense from 0; starts are stride-spaced
      assert(cs.map(_._2).toSeq == cs.indices.toSeq)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._3 == 12); case _ =>
      }
      if (n == 0) assert(cs.toSeq == Seq((i.toLong, 0, 0, 0)))
      else {
        // coverage: last chunk reaches exactly the end
        assert(cs.map(c => c._3 + c._4).max == n)
        // every chunk except possibly the last is full-size
        cs.dropRight(1).foreach(c => assert(c._4 == 16))
        // no redundant tail: a chunk must add at least one new token
        cs.sliding(2).foreach {
          case Array(a, b) => assert(b._3 + b._4 > a._3 + a._4); case _ =>
        }
      }
    }
  }

  test("heavy hitters: error bound holds for arbitrary streams and caps") {
    val item = Gen.frequency(3 -> Gen.const("hot"), 2 -> Gen.const("warm"),
      5 -> Gen.chooseNum(0, 200).map(i => s"cold$i"))
    (0 until 5).foreach { trial =>
      val xs = (0 until 400).flatMap(i =>
        item.apply(Gen.Parameters.default, Seed(trial * 1000L + i)))
      val cap = 4 + trial * 3
      val b = xs.foldLeft(graft.operators.HeavyHitters.emptyBuf(cap))(_.insert(_))
      val truth = xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      assert(b.counts.size <= cap)
      b.counts.foreach { case (k, est) =>
        assert(est <= truth(k) && truth(k) - est <= b.err)
      }
      truth.foreach { case (k, c) =>
        if (c > b.err) assert(b.counts.contains(k))
      }
    }
  }
}
