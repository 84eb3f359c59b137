package graft

import org.apache.spark.sql.functions._

import graft.llm.{Decontaminate, Index, Pack, TextAnalysis}

/** Corpus-curation operator specs: decontamination must flag exactly the
  * overlapping docs, index/tf-idf must match hand computation, packing
  * offsets must be bucketing-invariant, CDC chunks must conserve tokens and
  * re-align after edits. */
class CorpusOpsSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // ------------------------------------------------------- decontamination

  test("decontamination flags benchmark overlap and nothing else") {
    val corpus = docs(
      (1L, "one two three four five six seven"),   // shares the 5-gram "one two three four five"
      (2L, "totally different words here with zero benchmark overlap present"),
      (3L, "zz one two three four five tail"),     // same 5-gram mid-document
      (4L, "one three two four five six seven"))   // same words, different order → no shared 5-gram
    val bench = docs((100L, "prefix one two three four five"))
    val out = Decontaminate.contamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == (1L, true))
    assert(out(2L) == (0L, false))
    assert(out(3L) == (1L, true))
    assert(out(4L) == (0L, false))
  }

  test("bloom decontamination never misses what exact decontamination flags") {
    // 60 docs, a third sharing a benchmark 5-gram: every exact hit MUST be
    // a bloom hit (one-sided error); clean docs may rarely false-positive.
    val corpus = docs((0L until 60L).map { i =>
      if (i % 3 == 0) (i, s"filler$i the quick brown fox jumps tail$i")
      else (i, s"unique$i words only in doc number$i nothing shared$i")
    }: _*)
    val bench = docs((999L, "prefix the quick brown fox jumps suffix"))
    val exact = Decontaminate.contamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    val bloom = Decontaminate.bloomContamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("contaminated_bloom")).collect().map(_.getLong(0)).toSet
    assert(exact == (0L until 60L by 3).toSet)
    assert(exact.subsetOf(bloom),
      s"false negatives are forbidden: ${exact.diff(bloom)}")
  }

  test("md5-bloom decontamination: one-sided error, deterministic, sane sizing") {
    import graft.expressions.MdBloom
    val corpus = docs((0L until 60L).map { i =>
      if (i % 3 == 0) (i, s"filler$i the quick brown fox jumps tail$i")
      else (i, s"unique$i words only in doc number$i nothing shared$i")
    }: _*)
    val bench = docs((999L, "prefix the quick brown fox jumps suffix"))
    val exact = Decontaminate.contamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("contaminated")).collect().map(_.getLong(0)).toSet
    val bloom = Decontaminate.mdBloomContamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("contaminated_bloom")).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(bloom),
      s"false negatives are forbidden: ${exact.diff(bloom)}")
    // Deterministic across builds (no seed, no JVM hash salt).
    val again = Decontaminate.mdBloomContamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .filter(col("contaminated_bloom")).collect().map(_.getLong(0)).toSet
    assert(bloom == again)
    // Standard Bloom sizing: ~9.6 bits/element and ~7 hashes at fpp 0.01.
    assert(MdBloom.optimalNumBits(1000, 0.01) == 9586)
    assert(MdBloom.optimalNumHashes(1000, 9586) == 7)
    // Probe arithmetic matches the SQL form ('0x'||substr(md5(s),1,13)).
    assert(MdBloom.position(0, "the quick brown fox jumps", 1L << 52) ==
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("0:the quick brown fox jumps".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(13), 16))
  }

  test("decontamination counts distinct shared grams, not occurrences") {
    // Doc repeats the planted gram twice, but shingles are per-doc distinct.
    val corpus = docs((1L, "a b c d e x a b c d e"))
    val bench = docs((9L, "a b c d e"))
    val out = Decontaminate.contamination(corpus, "doc_id", "text", bench, "text", n = 5)
      .collect()
    assert(out.head.getLong(1) == 1L)
  }

  // ---------------------------------------------------------- inverted index

  test("inverted index: df is exact while postings cap at maxPostings") {
    val d = docs((0L until 30L).map(i => i -> s"common word$i"): _*)
    val out = Index.invertedIndex(d, "doc_id", "text", maxPostings = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("common")._1 == 30L)
    assert(out("common")._2 == "0,1,2,3,4")
    assert(out("word7") == ((1L, "7")))
  }

  test("inverted index counts a repeated term once per doc") {
    val d = docs((1L, "echo echo echo"), (2L, "echo"))
    val out = Index.invertedIndex(d, "doc_id", "text", maxPostings = 10).collect()
    val echo = out.find(_.getString(0) == "echo").get
    assert(echo.getLong(1) == 2L)
    assert(echo.getString(2) == "1,2")
  }

  // ----------------------------------------------------------------- tf-idf

  test("tf-idf scores match hand computation and k caps per doc") {
    // 4 docs; "rare" appears only in doc 1 (tf 2), "common" in all.
    val d = docs(
      (1L, "rare rare common"), (2L, "common common alpha"),
      (3L, "common beta beta"), (4L, "common gamma"))
    val out = Index.tfIdfTopTerms(d, "doc_id", "text", k = 2)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val expectRare = math.floor(2.0 * math.log(4.0 / 1.0) * 1e4 + 0.5) / 1e4
    assert(rows((1L, "rare")) == ((2L, expectRare)))
    // "common" is in every doc → idf = ln(1) = 0 everywhere.
    assert(rows.get((1L, "common")).forall(_._2 == 0.0))
    assert(out.groupBy("doc_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("tf-idf breaks score ties by term ascending") {
    val d = docs((1L, "zeta alpha"), (2L, "other thing"))
    // Both doc-1 terms have tf=1, df=1 → equal scores; k=1 must pick "alpha".
    val top = Index.tfIdfTopTerms(d, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1).collect()
    assert(top.length == 1 && top.head.getString(1) == "alpha")
  }

  // ------------------------------------------------------------------ bm25

  test("bm25 matches hand computation: idf floor, tf saturation, dl norm") {
    // 4 docs; "rare" only in doc 1 (tf 2, dl 3); "common" in all 4 docs.
    val d = docs(
      (1L, "rare rare common"), (2L, "common common alpha"),
      (3L, "common beta beta"), (4L, "common gamma"))
    val out = Index.bm25TopTerms(d, "doc_id", "text", k = 2)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val avgdl = (3.0 + 3.0 + 3.0 + 2.0) / 4.0
    def score(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log(1.0 + (4.0 - df + 0.5) / (df + 0.5))
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.floor(raw * 1e4 + 0.5) / 1e4
    }
    assert(rows((1L, "rare")) == ((2L, score(2, 1, 3))))
    // Lucene idf never goes negative — "common" (df = N) still scores > 0.
    assert(rows((4L, "common"))._2 == score(1, 4, 2))
    assert(rows((4L, "common"))._2 > 0.0)
    assert(out.groupBy("doc_id").count().collect().forall(_.getLong(1) <= 2))
  }

  test("bm25 ranks the rarer term above the saturated common term") {
    val d = docs(
      (1L, "needle common common common common"),
      (2L, "common common"), (3L, "common"), (4L, "common"))
    val top = Index.bm25TopTerms(d, "doc_id", "text", k = 1)
      .filter(col("doc_id") === 1).collect()
    assert(top.length == 1 && top.head.getString(1) == "needle")
  }

  // ---------------------------------------------------------------- packing

  test("packing offsets are exact cumulative sums and bucket-invariant") {
    val d = docs((0L until 50L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim): _*)
    val small = Pack.packSequences(d, "doc_id", "text", seqLen = 16, bucketSize = 4)
      .orderBy("doc_id").collect()
    val big = Pack.packSequences(d, "doc_id", "text", seqLen = 16, bucketSize = 1000)
      .orderBy("doc_id").collect()
    assert(small.map(_.toSeq).toSeq == big.map(_.toSeq).toSeq,
      "two-pass bucketed prefix sum must not depend on bucketSize")
    var cum = 0L
    small.foreach { r =>
      assert(r.getAs[Long]("start_offset") == cum)
      assert(r.getAs[Long]("seq_id") == cum / 16)
      val tok = r.getAs[Long]("tok_count")
      assert(r.getAs[Boolean]("crosses_boundary") == ((cum + tok - 1) / 16 > cum / 16))
      cum += tok
    }
  }

  // ------------------------------------------------------------- sampling

  test("inSample keeps everything at threshold 'g' and nothing at '00000000'") {
    import graft.llm.Sampling
    val d = docs((0L until 100L).map(i => i -> "x"): _*)
    val kept = d.filter(Sampling.inSample(col("doc_id"), lit("g"))).count()
    val none = d.filter(Sampling.inSample(col("doc_id"), lit("00000000"))).count()
    assert(kept == 100L && none == 0L)
  }

  test("inSample rate is deterministic and roughly proportional") {
    import graft.llm.Sampling
    val d = docs((0L until 1000L).map(i => i -> "x"): _*)
    val half = lit(Sampling.hexThreshold(0.5))
    val a = d.filter(Sampling.inSample(col("doc_id"), half)).count()
    val b = d.filter(Sampling.inSample(col("doc_id"), half)).count()
    assert(a == b, "membership must be identical across runs")
    assert(a > 400 && a < 600, s"~half expected, got $a")
  }

  test("weightedSample: deterministic, scale-invariant, weight-biased") {
    import spark.implicits._
    import graft.llm.Sampling
    // Weights 1 vs 100 split half/half over 400 ids.
    val d = (0L until 400L)
      .map(i => (i, if (i < 200) 1.0 else 100.0, "x"))
      .toDF("doc_id", "w", "text")
    val pick = Sampling.weightedSample(d, "doc_id", "w", k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(pick.size == 50)
    // Deterministic repeat.
    val again = Sampling.weightedSample(d, "doc_id", "w", k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(pick == again)
    // Scaling every weight by a constant divides every race key by it —
    // the pick ORDER cannot change.
    val scaled = Sampling.weightedSample(
        d.withColumn("w", col("w") * 7.0), "doc_id", "w", k = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(pick == scaled)
    // 100× weight ⇒ the heavy half dominates the sample.
    val heavy = pick.count(_ >= 200L)
    assert(heavy > 40, s"heavy-weight ids should dominate, got $heavy/50")
    // Non-positive and null weights are excluded.
    val bad = (0L until 10L).map(i => (i, if (i % 2 == 0) -1.0 else 0.0, "x"))
      .toDF("doc_id", "w", "text")
    assert(Sampling.weightedSample(bad, "doc_id", "w", k = 5).count() == 0)
  }

  // ------------------------------------------------------------ CDC chunks

  test("cdc chunks conserve tokens and match per-doc token counts") {
    val d = docs((0L until 20L).map(i =>
      i -> (0 until (i % 13 + 1).toInt).map(j => s"t${(i * 7 + j) % 31}").mkString(" ")): _*)
    val out = Pack.cdcChunks(d, "doc_id", "text", divisor = 4).collect()
    val expected = d.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("total_tokens") == expected(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_chunks") >= 1L)
      assert(r.getAs[Long]("max_chunk_tokens") >= r.getAs[Long]("min_chunk_tokens"))
    }
  }

  test("cdc boundaries re-align after a prefix edit (content-defined, not positional)") {
    import spark.implicits._
    val base = (0 until 60).map(j => s"tok${j % 17}").mkString(" ")
    val edited = "inserted words at front " + base
    // Chunk the token streams directly and compare the chunk token-lists
    // after each stream's first boundary: identical tails.
    def chunksOf(text: String): Seq[Seq[String]] = {
      val d = docs((1L, text))
      val toks = d.select(posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        .orderBy("pos").as[(Int, String)].collect()
      val flags = d.select(posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        .select(col("pos"), (pmod(xxhash64(col("tok")), lit(4)) === 0).as("b"))
        .orderBy("pos").as[(Int, Boolean)].collect().map(_._2)
      val out = scala.collection.mutable.ArrayBuffer[Seq[String]]()
      var cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.zip(flags).foreach { case ((_, t), b) =>
        cur += t
        if (b) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer[String]() }
      }
      if (cur.nonEmpty) out += cur.toSeq
      out.toSeq
    }
    val a = chunksOf(base)
    val b = chunksOf(edited)
    assert(a.length > 2, "test text must produce several chunks")
    // Only the chunk containing the edit can change (the prefix may even
    // add chunks of its own); everything after the first boundary in the
    // shared tail re-aligns, so a's chunk list minus its first chunk must
    // be a suffix of b's.
    assert(b.takeRight(a.length - 1) == a.drop(1),
      "chunks after the first boundary must be identical across the edit")
    // And the operator's stats agree with the reconstruction.
    val stats = Pack.cdcChunks(docs((1L, base)), "doc_id", "text", divisor = 4).head
    assert(stats.getAs[Long]("n_chunks") == a.length.toLong)
    assert(stats.getAs[Long]("max_chunk_tokens") == a.map(_.length).max.toLong)
  }

  // ------------------------------------------------- fixed-window chunking

  test("fixedChunks: full coverage, overlap stride, no redundant tail") {
    import spark.implicits._
    val words = (0 until 23).map(i => s"w$i")
    val df = docs((1L, words.mkString(" ")), (2L, "a b c"), (3L, "solo"))
    val out = Pack.fixedChunks(df, "doc_id", "text", chunkSize = 8, overlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2).toInt, r.getLong(3).toInt))
      .groupBy(_._1)
    // doc 1: n=23, stride=5 -> starts 0,5,10,15 (15+8=23 reaches the end;
    // a start at 20 would add nothing new and must NOT be emitted).
    assert(out(1L).map(c => (c._3, c._4)).toSeq.sorted ==
      Seq((0, 8), (5, 8), (10, 8), (15, 8)))
    // Coverage: max(start + n_tokens) == token count.
    assert(out(1L).map(c => c._3 + c._4).max == 23)
    // Short docs: exactly one chunk, full text.
    assert(out(2L).toSeq == Seq((2L, 0, 0, 3)))
    assert(out(3L).toSeq == Seq((3L, 0, 0, 1)))
    // Adjacent chunks share exactly `overlap` token positions.
    val starts1 = out(1L).map(_._3).sorted
    starts1.sliding(2).foreach { case Array(a, b) => assert(b - a == 5) }
  }

  test("group split never leaks a fingerprint group across splits") {
    import spark.implicits._
    // 40 base texts, each in two formatting variants (same fingerprint).
    val rows = (1 to 40).flatMap { i =>
      val base = s"document number $i with shared content body $i"
      Seq((i * 2L, base), (i * 2L + 1L, base.toUpperCase + "!!!"))
    }
    val lab = rows.toDF("doc_id", "text")
      .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
      .withColumn("split", graft.llm.Sampling.splitLabelByGroup($"fp", 0.5))
    val perGroup = lab.groupBy("fp")
      .agg(countDistinct("split").as("n")).collect()
    assert(perGroup.forall(_.getLong(1) == 1L), "a group straddled the split")
    val splits = lab.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits == Set("train", "val"), s"0.5 split should use both: $splits")
  }

  // ------------------------------------------------- compression-ratio QA

  test("compression ratio: repeated text collapses, varied text does not") {
    import spark.implicits._
    val varied = (1 to 200).map(i => s"tok$i payload${i * 37} x${i % 13}").mkString(" ")
    val repeated = Seq.fill(200)("the same banner line again").mkString("\n")
    val df = Seq(("v", varied), ("r", repeated), ("e", "")).toDF("k", "text")
    def ratios = df
      .select($"k", TextAnalysis.compressionRatio($"text").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val m = ratios
    assert(m("r") < 0.05, s"repeated text should collapse, got ${m("r")}")
    assert(m("v") > 3 * m("r"), s"varied ${m("v")} vs repeated ${m("r")}")
    assert(m("e") == 0.0)
    assert(ratios == m, "ratio must be deterministic across evaluations")
    // Kernel sanity: deflate length bounded by raw length + small overhead,
    // and codegen'd DataFrame path equals the direct kernel call.
    val direct = graft.expressions.DeflateLen.compressedLen(
      org.apache.spark.unsafe.types.UTF8String.fromString(varied))
    val viaDf = df.where($"k" === "v")
      .select(TextAnalysis.deflateLen($"text")).head.getInt(0)
    assert(direct == viaDf)
    assert(direct <= varied.getBytes("UTF-8").length + 16)
  }

  // ------------------------------------------------------- html extraction

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(TextAnalysis.htmlToText(col("h"))).head.getString(0)
  }

  test("htmlToText drops script/style subtrees, keeps visible text") {
    val out = extract(
      "<html><head><style>body { x: 1 }</style>" +
        "<script>if (a < b) { f(\"</p>\"); }</script></head>" +
        "<body><p>Hello <b>world</b></p><p>Second</p></body></html>")
    assert(out == "Hello world\nSecond")
  }

  test("htmlToText decodes entities with &amp; last (no double decode)") {
    // `&amp;lt;` is the AUTHOR writing the literal text "&lt;" — it must
    // decode to that literal, not cascade a second time into "<".
    assert(extract("<p>A &amp;lt; B</p>") == "A &lt; B")
    assert(extract("<p>Tom &amp; Jerry &lt;3 &quot;q&quot; &#39;s&#39;&nbsp;end</p>") ==
      "Tom & Jerry <3 \"q\" 's' end")
  }

  test("htmlToText separates table cells, anchors tag names, eats CRLF") {
    // td/th are block-level here: adjacent cell text must NOT merge.
    assert(extract("<table><tr><td>2021</td><td>Revenue</td></tr></table>") ==
      "2021\nRevenue")
    // <pre>/<param>/<link> must not match the p/li branches (anchored names).
    assert(extract("a<pre>b</pre>c") == "abc")
    assert(extract("x<link rel=\"y\">z") == "xz")
    // CRLF input leaves no stray \r lines.
    val crlf = extract("<p>Hello</p>\r\n<p>World</p>\r\n")
    assert(crlf == "Hello\nWorld" && !crlf.contains("\r"))
  }

  test("htmlToText collapses whitespace and turns block tags into newlines") {
    val out = extract(
      "<div>  one   two </div>\n\n  <ul><li> a </li><li>b</li></ul><br>tail  ")
    assert(out == "one two\na\nb\ntail")
    assert(extract("<p></p><p></p>") == "")
  }

  // ----------------------------------------------------------- bm25 search

  test("bm25Search ranks by summed query-term relevance, hand-recomputed") {
    val corpus = docs(
      (1L, "spark spark spark join"),          // heavy on two query terms
      (2L, "spark window"),                    // light on two
      (3L, "nothing relevant here at all"),    // no query term -> absent
      (4L, "join join window window window spark"))
    val got = Index.bm25Search(corpus, "doc_id", "text",
        Seq("spark", "join", "window"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // Independent reimplementation in plain scala.math — same formula,
    // same per-term floor-to-1e-4 units, same exact integer sum.
    val texts = Map(1L -> "spark spark spark join", 2L -> "spark window",
      4L -> "join join window window window spark")
    val toks = (texts + (3L -> "nothing relevant here at all"))
      .view.mapValues(_.split("\\s+").toSeq).toMap
    val dl = toks.view.mapValues(_.size.toDouble).toMap
    val nd = 4.0
    val avgdl = dl.values.sum / nd
    val query = Seq("spark", "join", "window")
    def dfOf(t: String) = toks.values.count(_.contains(t)).toDouble
    def score(id: Long): (Long, Double) = {
      val cs = query.flatMap { term =>
        val tf = toks(id).count(_ == term).toDouble
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (nd - dfOf(term) + 0.5) / (dfOf(term) + 0.5))
          val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl(id) / avgdl))
          Some(math.floor(c * 1e4 + 0.5).toLong)
        }
      }
      (cs.size.toLong, cs.sum / 1e4)
    }
    val expected = Seq(1L, 2L, 4L).map(id => (id, score(id)._1, score(id)._2))
      .sortBy { case (id, _, s) => (-s, id) }
    assert(got.toSeq == expected)
    assert(!got.exists(_._1 == 3L), "no-match docs never surface")
  }

  test("bm25Search top-k truncates after the full ranking") {
    val corpus = docs((1L, "a x"), (2L, "a a x"), (3L, "a a a x"), (4L, "x"))
    val got = Index.bm25Search(corpus, "doc_id", "text", Seq("a"), k = 2)
      .collect().map(_.getLong(0))
    // More occurrences -> higher tf saturation but still monotone here.
    assert(got.length == 2 && got.head == 3L)
  }
}
