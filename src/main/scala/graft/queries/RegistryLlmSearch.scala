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

/** LLM-pipeline text-analysis / search / tokenization queries.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryLlmSearch extends RegistryLlmDedup {

  /** Gopher top-n-gram repetition fractions (n = 2, 3, 4): character
    * coverage of the heaviest n-gram over the doc's char length. Computed
    * row-locally by the native TopNGramChars expression (zero shuffle);
    * the oracle mirrors the semantics relationally in DuckDB
    * (unnest windows → count → max) — same numbers, different plan. */
  protected def llmTopNgram(spark: SparkSession, dir: String): DataFrame = {
    def r4(c: Column) = floor(c * 10000.0 + 0.5) / 10000.0
    def frac(n: Int) = when(length(col("text")) > 0,
      r4(TextAnalysis.topNGramChars(col("text"), n) / length(col("text"))))
      .otherwise(lit(0.0))
    t(spark, dir, "documents")
      .select(col("doc_id"), frac(2).as("top2_frac"), frac(3).as("top3_frac"),
        frac(4).as("top4_frac"))
      .orderBy("doc_id")
  }

  /** Boilerplate-line removal: two web-chrome lines are appended to every
    * document (a copyright footer and a subscribe banner) and must be
    * stripped; line counts and the md5 of the cleaned text hash-compare
    * against the mirrored DuckDB rule set. */
  protected def llmBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(col("text"),
      lit("\nCopyright 2024 Example Corp. All rights reserved."),
      lit("\nSubscribe to our newsletter today!"))
    t(spark, dir, "documents")
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        size(split(col("dirty"), "\n")).cast("long").as("n_lines_in"),
        size(split(TextAnalysis.stripBoilerplate(col("dirty")), "\n"))
          .cast("long").as("n_lines_kept"),
        md5(TextAnalysis.stripBoilerplate(col("dirty"))).as("clean_hash"))
      .orderBy("doc_id")
  }

  protected def llmLangId(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.langIds(t(spark, dir, "documents"), "doc_id", "text")
      .groupBy("detected_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("detected_lang")

  /** Vocabulary-coverage / OOV report: fix the top-50 token vocabulary
    * (freq desc, token tie-break — deterministic), then measure what it
    * covers: occurrence-level and type-level OOV rates, the go/no-go
    * numbers behind sizing a tokenizer's vocab before training it. The
    * vocab is a 50-row broadcast; coverage is one aggregate over the
    * token stream — at 100 TB the stream never shuffles except for the
    * type-distinct count. */
  protected def llmOovRate(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
    val vocab = TextAnalysis.topVocabulary(
        t(spark, dir, "documents"), "text", n = 1, k = 50)
      .select(col("gram").as("token"), lit(1L).as("_in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .agg(count(lit(1)).as("n_occurrences"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct(col("token")).as("n_types"),
        countDistinct(when(col("_in_vocab").isNull, col("token")))
          .as("n_oov_types"))
      .select(col("n_occurrences"), col("n_oov"),
        (floor(col("n_oov") * 10000.0 / col("n_occurrences") + 0.5) / 10000)
          .as("oov_rate"),
        col("n_types"), col("n_oov_types"),
        (floor(col("n_oov_types") * 10000.0 / col("n_types") + 0.5) / 10000)
          .as("type_oov_rate"))
  }

  /** Statistical-watermark bias probe (the Kirchenbauer 2023 green-list
    * detector generalized to a fixed keyed partition): tokens split
    * green/red by their md5 head nibble (p = ½ by construction), and
    * each document's green excess z-scores as (2g − n)/√n — synthetic
    * text stamped with a green-list watermark surfaces at |z| ≫ 0, a
    * contamination check a training-data pipeline runs over scraped
    * corpora. Integer numerator, ONE sqrt per doc, 4 dp floor; flags at
    * |z| ≥ 4. Row-local token work, one top-k. */
  protected def llmWatermark(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
        aggregate(transform(toks,
            w => when(substring(md5(w), 1, 1).isin(
              "0", "1", "2", "3", "4", "5", "6", "7"), 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("n_green"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("n_green"),
        (floor((col("n_green") * 2 - col("n_tokens")).cast("double")
          / sqrt(col("n_tokens").cast("double")) * 1e4) / 1e4).as("z4"))
      .orderBy(abs(col("z4")).desc, col("doc_id"))
      .limit(20)
  }

  /** Compression-ratio quality signal (rows-only: no SQL engine exposes a
    * compress() to replay DEFLATE): per-document deflate/raw byte ratio
    * plus the same ratio on an 8×-repeated variant — the repeated column
    * demonstrates on real data what the spec pins synthetically, that
    * template spam collapses the ratio. Shuffle-free projection. */
  protected def llmCompressRatio(spark: SparkSession, dir: String): DataFrame = {
    val rep = concat_ws("\n", Seq.fill(8)(col("text")): _*)
    t(spark, dir, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        TextAnalysis.deflateLen(col("text")).as("deflate_bytes"),
        TextAnalysis.compressionRatio(col("text")).as("ratio"),
        TextAnalysis.compressionRatio(rep).as("ratio_repeated"),
        (TextAnalysis.compressionRatio(col("text")) < 0.3).as("too_repetitive"))
      .orderBy("doc_id")
  }

  /** Constant-corpus determinism twin of [[llmCompressRatio]] — the
    * conversion that moves DEFLATE from rows-only to oracle-checked:
    * DuckDB has no compress(), so the oracle carries PRECOMPUTED
    * deflate lengths (computed once with the JDK zlib at the kernel's
    * exact parameters — level 6, raw/nowrap, single finish pass) for a
    * fixed 10-doc corpus spanning the interesting shapes (empty, single
    * byte, pangram, single-char run, prose, word spam, digit cycle,
    * multi-byte UTF-8, long prose, repeated JSON keys). The engine
    * recomputes deflate_bytes through the native [[graft.expressions
    * .DeflateLen]] expression; the hash gate then pins the kernel
    * against the constants — any drift in level/strategy/dictionary
    * handling fails the gate. ratio4 is integer-replayed on BOTH sides
    * from each side's own deflate_bytes. Shuffle-free projection. */
  protected def llmCompressRatioDet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val corpus = Seq(
      0L -> "",
      1L -> "a",
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "a" * 60,
      4L -> ("Lorem ipsum dolor sit amet, consectetur adipiscing elit, " +
        "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua."),
      5L -> (("spam " * 16).trim),
      6L -> ("0123456789" * 4),
      7L -> ("naive cafe resume éèê " +
        "中文文本 üöä"),
      8L -> ("Call me Ishmael. Some years ago-never mind how long " +
        "precisely-having little or no money in my purse, and nothing " +
        "particular to interest me on shore, I thought I would sail " +
        "about a little and see the watery part of the world."),
      9L -> """{"k": 1, "k": 2, "k": 3, "k": 4, "k": 5, "k": 6, "k": 7, "k": 8}""")
    corpus.toDF("doc", "text")
      .select(col("doc"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        TextAnalysis.deflateLen(col("text")).cast("long").as("deflate_bytes"))
      .withColumn("ratio4", expr(
        "CASE WHEN n_bytes = 0 THEN NULL" +
          " ELSE deflate_bytes * 10000 div n_bytes END"))
      .orderBy("doc")
  }

  /** HTML → visible-text extraction (the CommonCrawl-style first step):
    * wrap each document in a synthetic page (script/style subtrees, block
    * tags, entities) and check the extractor recovers clean line-structured
    * text. Row-local, shuffle-free; oracle mirrors every regex in RE2. */
  protected def llmHtmlExtract(spark: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>T</title><style>p { color: red; }</style>" +
        "<script>if (a < b && c > 0) { alert(\"x\"); }</script></head>" +
        "<body>\n<h1 class=\"hd\">Doc "), col("doc_id"),
      lit("</h1>\n<p>"), col("text"),
      lit("</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot;&nbsp;&#39;q&#39;</div>" +
        "<ul><li>one</li><li>two</li></ul></body></html>"))
    t(spark, dir, "documents")
      .select(col("doc_id"), TextAnalysis.htmlToText(html).as("txt"))
      .select(col("doc_id"),
        length(col("txt")).cast("long").as("n_chars"),
        size(split(col("txt"), "\n")).cast("long").as("n_lines"),
        md5(col("txt")).as("txt_hash"))
      .orderBy("doc_id")
  }

  /** McNemar's paired test (McNemar 1947, continuity-corrected) between
    * the engine's own two document-quality classifiers — the Gopher
    * format gate and the heuristic score at its 0.5 threshold — on the
    * SAME documents: do they disagree more than chance in one
    * direction, i.e. is one systematically stricter? (The
    * classifier-comparison question an eval loop asks before swapping
    * filters; unpaired tests waste the pairing.) FULLY integer: the
    * 2×2 discordant cells b (gopher-only) and c (quality-only) are
    * exact counts from ONE corpus pass (both classifiers evaluated in
    * the same projection — no self-join), χ² = (max(|b−c|−1, 0))²·10⁶
    * div (b+c) and the agreement rate are micro divisions; b+c = 0
    * degenerates to 0 on both engines. */
  protected def llmMcnemar(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(TextAnalysis.gopherPass(col("text")).as("gp"),
        (TextAnalysis.qualityScore(col("text")) >= 0.5).as("qp"))
    d.agg(count(lit(1)).as("n"),
        sum(when(col("gp") && col("qp"), 1L).otherwise(0L)).as("both_pass"),
        sum(when(col("gp") && !col("qp"), 1L).otherwise(0L))
          .as("gopher_only"),
        sum(when(!col("gp") && col("qp"), 1L).otherwise(0L))
          .as("quality_only"),
        sum(when(!col("gp") && !col("qp"), 1L).otherwise(0L))
          .as("neither"))
      .select(col("n"), col("both_pass"), col("gopher_only"),
        col("quality_only"), col("neither"),
        expr("(both_pass + neither) * 1000000 div n").as("agree_micro"),
        expr("CASE WHEN gopher_only + quality_only = 0 THEN 0 ELSE " +
          "greatest(abs(gopher_only - quality_only) - 1, 0) " +
          "* greatest(abs(gopher_only - quality_only) - 1, 0) " +
          "* 1000000 div (gopher_only + quality_only) END")
          .as("mcnemar_micro"))
  }

  /** Per-document lexical diversity: type–token ratio, Guiraud's root
    * TTR R = V/√N (the length-robust variant TTR lacks — TTR decays
    * mechanically with doc length, R doesn't), and the hapax-legomenon
    * fraction (Zipf's tail mass — a high hapax share flags
    * boilerplate-free natural prose, a low one flags template spam).
    * The per-doc companion to the corpus-level [[llmHeaps]]/[[llmZipf]]
    * curves. Scale shape: one explode → (doc, token) count → per-doc
    * aggregate (two hash shuffles, linear in corpus tokens); empty docs
    * keep a zero row via the left join so the relation stays total.
    * ttr/hapax are micro integer divisions; Guiraud is the single
    * V/√N double surface floored 4 dp. */
  protected def llmLexdiv(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val counts = docs
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    docs.select(col("doc_id")).join(counts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_hapax"), lit(0L)).as("n_hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
        expr("CASE WHEN n_tokens = 0 THEN 0" +
          " ELSE n_types * 1000000 div n_tokens END").as("ttr_micro"),
        expr("CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)" +
          " ELSE floor(CAST(n_types AS DOUBLE)" +
          " / sqrt(CAST(n_tokens AS DOUBLE)) * 10000) / 10000 END")
          .as("guiraud4"),
        expr("CASE WHEN n_tokens = 0 THEN 0" +
          " ELSE n_hapax * 1000000 div n_tokens END").as("hapax_micro"))
      .orderBy("doc_id")
  }

  /** Multi-reference ROUGE-2 against the fixed md5-ranked 20-doc panel
    * (Lin 2004) — the recall side of the corpus-diversity pair:
    * [[llmSelfBleu]] is precision-oriented (how much of the candidate
    * is in the panel), ROUGE-2 recall asks how much of a panel
    * reference the candidate covers, and multi-ref ROUGE takes the
    * best reference by F1 = 2·o/(n_d+n_r) (the exact rational the P/R
    * harmonic mean collapses to). FULLY integer: clipped bigram
    * overlaps are exact counts, all three surfaces are micro
    * divisions, best-ref selection compares truncated f1_micro with
    * min-ref_id tiebreak among refs WITH overlap (no-overlap docs fall
    * back to the min-id panel ref at zero) — deterministic on both
    * engines. Scale shape: panel side is 20 rows broadcast everywhere;
    * overlap flows through one gram join and one max-struct aggregate,
    * linear in corpus bigrams. */
  protected def llmRouge2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), trim(col("text")).as("text"))
      .filter(size(TextAnalysis.tokens(col("text"))) >= 2)
    val refs = docs
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(Window.orderBy("hk")))
      .filter(col("rk") <= 20)
      .select(col("doc_id").as("ref_id"), col("text"))
      .localCheckpoint(true)
    val refBi = refs
      .select(col("ref_id"), explode(TextAnalysis.wordGrams(col("text"), 2))
        .as("gram"))
      .groupBy("ref_id", "gram").agg(count(lit(1)).as("rc"))
    val refTot = refBi.groupBy("ref_id").agg(sum(col("rc")).as("nr"))
    val cand = docs
      .join(broadcast(refs.select(col("ref_id").as("doc_id"))),
        Seq("doc_id"), "left_anti")
    val candBi = cand
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(col("text"), 2))
        .as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
    // nd = tokens − 1 directly off the candidate scan: no second pass
    // over the exploded bigram relation.
    val candTot = cand.select(col("doc_id"),
      (size(TextAnalysis.tokens(col("text"))) - 1).cast("long").as("nd"))
    val ov = candBi.join(broadcast(refBi), Seq("gram"))
      .groupBy("doc_id", "ref_id")
      .agg(sum(least(col("cnt"), col("rc"))).as("o"))
    // Best ref = argmax truncated-F1 over refs WITH overlap, min-ref_id
    // tiebreak, as ONE max-struct aggregate (a doc × panel grid + rank
    // window computes the same thing at 20× the rows); docs overlapping
    // no ref at all fall back to the min-id panel ref with o = 0.
    val best = ov.join(broadcast(refTot), Seq("ref_id"))
      .join(candTot, Seq("doc_id"))
      .withColumn("f1_micro", expr("2 * o * 1000000 div (nd + nr)"))
      .groupBy("doc_id")
      .agg(max(struct(col("f1_micro"), (-col("ref_id")).as("nref"),
        col("ref_id"), col("o"), col("nr"))).as("b"))
    val fallback = broadcast(refTot.agg(
      min_by(struct(col("ref_id"), col("nr")), col("ref_id")).as("fb")))
    candTot.join(best, Seq("doc_id"), "left").crossJoin(fallback)
      .select(col("doc_id"),
        coalesce(col("b.ref_id"), col("fb.ref_id")).as("best_ref"),
        coalesce(col("b.o"), lit(0L)).as("overlap"),
        col("nd"),
        coalesce(col("b.nr"), col("fb.nr")).as("nr"),
        coalesce(col("b.f1_micro"), lit(0L)).as("f1_micro"))
      .select(col("doc_id"), col("best_ref"), col("overlap"),
        col("nd"), col("nr"),
        expr("overlap * 1000000 div nr").as("recall_micro"),
        expr("overlap * 1000000 div nd").as("precision_micro"),
        col("f1_micro"))
      .orderBy("doc_id")
  }

  /** Dunning G² collocations over adjacent bigrams
    * ([[graft.llm.Cooccur.dunningG2]]) — the likelihood-ratio companion
    * to [[llmCooccurPmi]]: PMI over-ranks rare pairs, G² weights each
    * cell by its count, so the two queries together give the
    * surprise/support view a phrase-vocabulary induction pass needs. */
  protected def llmCollocations(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Cooccur.dunningG2(t(spark, dir, "documents"), "text",
        minCount = 5L)
      .orderBy("tok_a", "tok_b")

  /** NFC unicode normalization (native UnicodeNormalize expression). The
    * corpus text is already NFC, so the query appends a DECOMPOSED
    * "e"+U+0301 suffix — normalization must compose it to "é", shortening
    * the string by one code point; md5 + length are hash-compared against
    * DuckDB's nfc_normalize. */
  protected def llmNfc(spark: SparkSession, dir: String): DataFrame = {
    val norm = TextAnalysis.unicodeNormalize(concat(col("text"), lit("e\u0301")))
    t(spark, dir, "documents")
      .select(col("doc_id"), md5(norm).as("norm_hash"),
        length(norm).cast("long").as("norm_chars"))
      .orderBy("doc_id")
  }

  /** Gopher repetition rules over documents with every third text given a
    * duplicated-line tail (the synthetic docs are single-line, so the
    * injection is what makes the rule bite; both engines build the same
    * input). */
  protected def llmRepetition(spark: SparkSession, dir: String): DataFrame = {
    val injected = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit("\n"), col("text")))
      .otherwise(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.dupLineFrac(injected).as("dup_line_frac"),
        TextAnalysis.dupLineCharFrac(injected).as("dup_line_char_frac"))
      .orderBy("doc_id")
  }

  protected def llmTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
        length(col("text")).cast("long").as("n_chars_computed"))
      .orderBy("doc_id")

  /** Corpus-wide top-100 token vocabulary (the BPE/vocab-builder counting
    * pass), deterministic (freq desc, gram asc) tie-break. */
  protected def llmVocab(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.topVocabulary(t(spark, dir, "documents"), "text", n = 1, k = 100)

  /** CCNet-style LM quality score: add-one-smoothed token-bigram model
    * trained on the corpus, every document scored by average bigram
    * log-probability through a broadcast-joined model. */
  protected def llmLmScore(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = graft.llm.NgramLm.fit(docs, "text")
    graft.llm.NgramLm.scoreAvgLogProb(docs, "doc_id", "text", model)
      .orderBy("doc_id")
  }

  /** Kneser–Ney-lite LM quality score — the absolute-discounting +
    * continuation-backoff upgrade of [[llmLmScore]] (see
    * [[graft.llm.NgramLm.scoreKneserNey]]): same corpus fit, same
    * broadcast-scoring shape, but unseen-bigram mass goes to words
    * that complete many contexts instead of merely frequent ones. */
  protected def llmLmKn(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = graft.llm.NgramLm.fit(docs, "text")
    graft.llm.NgramLm.scoreKneserNey(docs, "doc_id", "text", model)
      .orderBy("doc_id")
  }

  /** Min-K% probability membership probe over the corpus-fit bigram LM —
    * see [[graft.llm.NgramLm.minKScore]]; ranked ascending (the most
    * "surprising" documents first — the contamination review queue). */
  protected def llmMinK(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = graft.llm.NgramLm.fit(docs, "text")
    graft.llm.NgramLm.minKScore(docs, "doc_id", "text", model)
      .orderBy(col("mink_logp"), col("doc_id"))
      .limit(20)
  }

  /** Inverted index over document tokens: term → (df, first-20 postings),
    * posting sample capped pre-shuffle via WindowGroupLimit. */
  protected def llmPostings(spark: SparkSession, dir: String): DataFrame =
    Index.invertedIndex(t(spark, dir, "documents"), "doc_id", "text",
        maxPostings = 20)
      .orderBy("term")

  /** Top-3 TF-IDF terms per document (4-decimal rounded scores, term
    * tie-break). */
  protected def llmTfIdf(spark: SparkSession, dir: String): DataFrame =
    Index.tfIdfTopTerms(t(spark, dir, "documents"), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))

  /** Top-3 BM25 terms per document (k1 = 1.2, b = 0.75, Lucene idf;
    * 4-decimal rounded scores, term tie-break). */
  protected def llmBm25(spark: SparkSession, dir: String): DataFrame =
    Index.bm25TopTerms(t(spark, dir, "documents"), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("bm25").desc, col("term"))

  /** BPE subword tokenization: 200 merges learned from the corpus' own
    * word-frequency table, applied via the native codegen'd encoder.
    * The iterative merge learning isn't SQL-expressible → rows-only
    * driver check; BpeSpec pins the algorithm (hand-derived merges,
    * losslessness, train/apply agreement, determinism). */
  protected def llmBpe(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = graft.llm.Bpe.train(docs, "text", numMerges = 200)
    docs.select(col("doc_id"),
        graft.llm.Bpe.encode(col("text"), merges).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_bpe_tokens"),
        array_join(slice(col("toks"), 1, 12), " ").as("head_tokens"))
      .orderBy("doc_id")
  }

  /** Token co-occurrence PMI over the corpus (collocation mining) — see
    * [[graft.llm.Cooccur.pmi]] for the array-side pair generation that
    * keeps this one shuffle-free explode + two hash aggs instead of a
    * positions self-join. The oracle replays the counts via the
    * independent positions-join derivation and the PMI formula op for op. */
  protected def llmCooccurPmi(spark: SparkSession, dir: String): DataFrame =
    graft.llm.Cooccur.pmi(t(spark, dir, "documents"), "doc_id", "text",
        span = 2, minCount = 5L)
      .orderBy("tok_a", "tok_b")

  /** Deterministic BPE twin: 8 merges trained on a bounded doc slice
    * (no maxWords truncation — the slice IS bounded), merge table AND
    * the top-10 words' encodings surfaced. The oracle is GENERATED
    * ([[graft.llm.Bpe.oracleCtes]]): DuckDB re-runs the entire merge-
    * learning loop — pair counts, argmax tie-breaks, leftmost-stepping
    * merge application — and must reproduce the table and the
    * segmentations. Encoding rides the native codegen'd BpeEncode, whose
    * rank-greedy apply provably reproduces training segmentation on
    * training words. */
  protected def llmBpeDet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents").filter(col("doc_id") < 50)
    val merges = graft.llm.Bpe.train(docs, "text", numMerges = 8,
      maxWords = 1000000)
    val mergeDf = merges.pairs.zipWithIndex
      .map { case ((a, b), i) => ("merge", (i + 1).toLong, a, b) }
      .toDF("kind", "ord", "s1", "s2")
    // Top-10 window runs over a 10-row relation — not a scale hazard.
    val top = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w")).limit(10)
    val wordDf = top
      .withColumn("ord", row_number()
        .over(Window.orderBy(col("freq").desc, col("w"))).cast("long"))
      .select(lit("word").as("kind"), col("ord"), col("w").as("s1"),
        array_join(graft.llm.Bpe.encode(col("w"), merges), "\u0001").as("s2"))
    mergeDf.unionByName(wordDf).orderBy("kind", "ord")
  }

  /** BM25 corpus search: top-10 documents for a three-term query — the
    * "find me training examples about X" curation lookup. Per-term
    * contributions floor to integer 1e-4 units before the per-doc sum, so
    * the score is order-independent and hash-exact on both engines
    * (see [[graft.llm.Index.bm25Search]]). */
  protected def llmSearchBm25(spark: SparkSession, dir: String): DataFrame =
    Index.bm25Search(t(spark, dir, "documents"), "doc_id", "text",
      queryTerms = Seq("spark", "join", "window"), k = 10)

  /** Exact phrase search over a positional index — the retrieval op the
    * doc-id-only inverted index (`q_llm_postings`) cannot answer: find
    * documents containing the two-word phrase "data query" as ADJACENT
    * tokens, ranked by occurrence count. Scale shape: the position
    * explode filters to the phrase's terms immediately (only their
    * positions shuffle — |phrase| rows per matching doc, not the token
    * stream), adjacency is one equi-join on (doc, pos+1), and the top-k
    * is TakeOrderedAndProject. */
  protected def llmPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val (w1, w2) = ("data", "query")
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
    val a = toks.filter(col("term") === w1)
      .select(col("doc_id"), col("pos"))
    val b = toks.filter(col("term") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("doc_id"))
      .limit(10)
  }

  /** Jensen–Shannon divergence between the token distributions of the
    * even- and odd-numbered source shards (Lin 1991) — the symmetric,
    * bounded [0, ln 2] corpus-mix drift metric a training pipeline
    * tracks across recrawls/resamples where KL explodes on unseen
    * tokens. Exactness: with integer token counts a_i (A = Σa) and b_i
    * (B = Σb), each log-ratio reduces to ln(2·a_i·B / (a_i·B + b_i·A))
    * — an exact-integer ratio whose ln both engines evaluate on
    * IDENTICAL doubles — floored to 1e-8 micro-units BEFORE the
    * count-weighted sum (the markov-entropy/Theil discipline), so
    * addition order never reaches the result; one division per side at
    * the surface, 6 dp floor. Vocabulary-sized relations only after the
    * one token-count aggregate. */
  protected def llmJsd(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val toks = t(spark, dir, "documents")
      .select((expr("CAST(substring(source, 4, 8) AS INT)") % 2 === 0)
        .as("even"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val counts = toks.groupBy("tok")
      .agg(sum(when(col("even"), 1L).otherwise(0L)).as("a"),
        sum(when(col("even"), 0L).otherwise(1L)).as("b"))
    val tot = counts.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
    val terms = counts.crossJoin(broadcast(tot))
      .select(col("a"), col("b"),
        when(col("a") > 0, col("a").cast(dec) * floor(
          log((lit(2.0) * col("a") * col("tb"))
            / (col("a").cast("double") * col("tb")
              + col("b").cast("double") * col("ta"))) * 1e8))
          .otherwise(lit(0).cast(dec)).as("la"),
        when(col("b") > 0, col("b").cast(dec) * floor(
          log((lit(2.0) * col("b") * col("ta"))
            / (col("a").cast("double") * col("tb")
              + col("b").cast("double") * col("ta"))) * 1e8))
          .otherwise(lit(0).cast(dec)).as("lb"),
        col("ta"), col("tb"))
    terms.groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_vocab"), sum(col("la")).as("sa"),
        sum(col("lb")).as("sb"))
      .select(col("n_vocab"), col("ta").as("tokens_even"),
        col("tb").as("tokens_odd"),
        (floor((col("sa").cast("double") / col("ta")
          + col("sb").cast("double") / col("tb")) / 2.0 / 1e8 * 1e6) / 1e6)
          .as("jsd6"))
  }

  /** Multi-reference self-BLEU (Papineni et al. 2002 BLEU; Zhu et al.
    * 2018 use self-BLEU as the corpus-diversity metric — high scores
    * flag mode collapse / template spam in generated training data):
    * every document scored BLEU-2 against a fixed 20-document reference
    * panel (bottom-20 by md5(doc_id) — deterministic, excluded from
    * scoring). Exactness: clipped n-gram matches are exact integers
    * (min(count, max-over-refs count) — the standard multi-reference
    * clip), the brevity-penalty reference length is the closest ref
    * length with ties to the shorter via an integer-packed argmin
    * (|r−c|·10⁹ + r), and the BLEU surface is ONE fixed-order double
    * expression exp(bp + ½ln p₁ + ½ln p₂) per doc, 4 dp floor; zero
    * matches at either order short-circuit to 0 before any ln. Scale
    * shape: the panel relations (lengths, per-gram max counts) are tiny
    * and broadcast; the corpus sees one explode → per-doc count pass
    * per order — no doc×doc pair join anywhere, unlike naive self-BLEU
    * (which is quadratic by definition; the fixed panel is the
    * documented estimator trade). */
  protected def llmSelfBleu(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), trim(col("text")).as("text"))
      .filter(size(TextAnalysis.tokens(col("text"))) >= 2)
    val refs = docs
      .withColumn("hk", md5(col("doc_id").cast("string")))
      .withColumn("rk", row_number().over(Window.orderBy("hk")))
      .filter(col("rk") <= 20)
      .select(col("doc_id").as("ref_id"), col("text"))
      .localCheckpoint(true)
    val refLens = refs
      .select(col("ref_id"), size(TextAnalysis.tokens(col("text"))).as("r"))
    val refUni = refs
      .select(col("ref_id"), explode(TextAnalysis.tokens(col("text")))
        .as("tok"))
      .groupBy("ref_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("tok").agg(max(col("c")).as("rmax"))
    val refBi = refs
      .select(col("ref_id"), explode(TextAnalysis.wordGrams(col("text"), 2))
        .as("gram"))
      .groupBy("ref_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("gram").agg(max(col("c")).as("rmax"))
    val cand = docs
      .join(broadcast(refs.select(col("ref_id").as("doc_id"))),
        Seq("doc_id"), "left_anti")
    val base = cand
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("c1"))
      .crossJoin(broadcast(refLens))
      .groupBy("doc_id", "c1")
      .agg(min(abs(col("r") - col("c1")) * 1000000000L + col("r"))
        .as("rkey"))
      .select(col("doc_id"), col("c1"), (col("c1") - 1L).as("c2"),
        pmod(col("rkey"), lit(1000000000L)).as("r"))
    val m1 = cand
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text")))
        .as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
      .join(broadcast(refUni), Seq("tok"))
      .groupBy("doc_id").agg(sum(least(col("cnt"), col("rmax"))).as("m1"))
    val m2 = cand
      .select(col("doc_id"), explode(TextAnalysis.wordGrams(col("text"), 2))
        .as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .join(broadcast(refBi), Seq("gram"))
      .groupBy("doc_id").agg(sum(least(col("cnt"), col("rmax"))).as("m2"))
    val bp = when(col("c1") >= col("r"), lit(0.0))
      .otherwise(lit(1.0) - col("r").cast("double") / col("c1").cast("double"))
    base.join(m1, Seq("doc_id"), "left").join(m2, Seq("doc_id"), "left")
      .select(col("doc_id"), col("c1"), col("r"),
        coalesce(col("m1"), lit(0L)).as("m1"),
        coalesce(col("m2"), lit(0L)).as("m2"),
        when(coalesce(col("m1"), lit(0L)) === 0L
          || coalesce(col("m2"), lit(0L)) === 0L, lit(0L))
          .otherwise(floor(exp(bp
            + lit(0.5) * log(col("m1").cast("double")
              / col("c1").cast("double"))
            + lit(0.5) * log(col("m2").cast("double")
              / col("c2").cast("double"))) * 1e4).cast("long"))
          .as("bleu4"))
      .orderBy("doc_id")
  }

  /** Top distinctive terms between two sources by chi-square over
    * document frequencies — KS (`q_stats_ks_quality`) says WHETHER the
    * corpora differ; this says WHICH terms carry the difference (the
    * Monroe-et-al "fighting words" diagnostic, χ² flavor). Exactness:
    * the 2×2 table is integer doc counts, and BOTH sides of the ratio —
    * N·(ad−bc)² (~10²²) and the marginal product (a+b)(c+d)·n1·n2
    * (worst case N⁴/16, past Long once the corpus tops ~110k docs) —
    * accumulate in DECIMAL(38,0); the statistic surfaces through two
    * correctly-rounded double casts and one floored 4 dp division. */
  protected def llmTermDrift(spark: SparkSession, dir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val docs = t(spark, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
    val nn = docs.groupBy().agg(
      sum(when(col("source") === "src0", 1L).otherwise(0L)).as("n1"),
      sum(when(col("source") === "src1", 1L).otherwise(0L)).as("n2"))
    val ab = docs.select(col("source"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"))
      .groupBy("term").agg(
        sum(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("b"))
    val det = col("a") * col("d") - col("b") * col("c")
    val num = (col("n1") + col("n2")).cast(dec) * det.cast(dec) * det.cast(dec)
    val den = (col("a") + col("b")).cast(dec) * (col("c") + col("d")).cast(dec) *
      col("n1").cast(dec) * col("n2").cast(dec)
    ab.crossJoin(broadcast(nn))
      .withColumn("c", col("n1") - col("a"))
      .withColumn("d", col("n2") - col("b"))
      .filter((col("a") + col("b")) > 0 && (col("c") + col("d")) > 0)
      .withColumn("chi4",
        floor(num.cast("double") / den.cast("double") * 1e4) / 1e4)
      .select(col("term"), col("a"), col("b"), col("chi4"))
      .orderBy(col("chi4").desc, col("term"))
      .limit(10)
  }

  /** Personalized PageRank from the modulus-100 supplier seed set over
    * the symmetrized supplier–part graph — the TrustRank-style seed
    * expansion ([[graft.operators.Ppr]]); same picorank unit arithmetic
    * and generated unrolled-CTE oracle as q_graph_pagerank. */
  /** BERT-style masked-LM corruption plan (Devlin et al. 2019: select
    * 15% of tokens; of those 80% → [MASK], 10% → swap with a token drawn
    * from the same document, 10% → keep) — fully DETERMINISTIC: the
    * select / branch / pick draws are independent md5 channels keyed by
    * (doc_id, position), so the corruption is reproducible across runs
    * and engines and the oracle replays every decision. Per sampled doc:
    * branch counts, an order-invariant (pos+1)·(op+1) decision checksum,
    * and the summed length of swap replacements (pins the picks). All
    * row-local except ONE doc-grouped aggregate. */
  protected def llmMaskTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(37)) === 0)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
    val tok = docs.select(col("doc_id"), col("ts"),
      posexplode(col("ts")).as(Seq("pos", "tok")))
    def h(tag: String) = conv(substring(md5(concat(
        col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"), lit(":" + tag))), 1, 8), 16, 10)
      .cast("long")
    val sel = tok
      .withColumn("h1", pmod(h("sel"), lit(100)))
      .withColumn("op",
        when(col("h1") < 15, pmod(h("op"), lit(10))).otherwise(lit(-1L)))
      .withColumn("swap_tok", when(col("op") === 8,
        element_at(col("ts"),
          (pmod(h("pick"), size(col("ts"))) + 1).cast("int"))))
    sel.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("op") >= 0, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("op").between(0, 7), 1L).otherwise(0L)).as("n_masked"),
        sum(when(col("op") === 8, 1L).otherwise(0L)).as("n_swapped"),
        sum(when(col("op") === 9, 1L).otherwise(0L)).as("n_kept"),
        coalesce(sum(when(col("op") === 8, length(col("swap_tok")))), lit(0L))
          .cast("long").as("swap_len_sum"),
        sum(when(col("op") >= 0, (col("pos") + 1) * (col("op") + 1))
          .otherwise(0L)).as("decision_checksum"))
      .orderBy("doc_id")
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al. 2009):
    * the BM25 lexical top-20 and the brute-force-cosine semantic top-20
    * (doc_id ≙ vec_id in the corpus) fuse by Σ 10⁹ div (60 + rank) —
    * integer division, so the fused score is EXACT and order-independent
    * — and the top-10 hybrid hits surface with their list count. The
    * RAG-retrieval shape: lexical recall catches what embeddings miss
    * and vice versa. Rank windows run over the two 20-row lists only. */
  protected def llmSearchHybrid(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = Index.bm25Search(t(spark, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("spark", "join", "window"), k = 20)
      .withColumn("r", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"),
        expr("1000000000 div (r + 60)").as("c"))
    val ann = Similarity.bruteForceTopK(t(spark, dir, "embeddings"),
        "embedding", "vec_id", queryVector(spark, dir), k = 20)
      .withColumn("r", row_number()
        .over(Window.orderBy(col("cosine_sim").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("id"),
        expr("1000000000 div (r + 60)").as("c"))
    bm.unionByName(ann)
      .groupBy("id").agg(sum(col("c")).as("rrf_units"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_units").desc, col("id")).limit(10)
      .select(col("id").as("doc_id"), col("n_lists"), col("rrf_units"))
  }

  /** The MRR eval's fixed query set: five two-term queries over the
    * corpus vocabulary; a document is RELEVANT to a query iff it
    * contains BOTH terms (the deterministic AND-match label an eval
    * without human judgments can honestly claim). */
  protected val mrrQueries: Seq[(Long, String, String)] = Seq(
    (1L, "data", "query"), (2L, "spark", "join"), (3L, "hash", "merge"),
    (4L, "scan", "filter"), (5L, "stream", "window"))

  /** Mean Reciprocal Rank of BM25 retrieval (the standard TREC QA /
    * retrieval-eval metric, Voorhees 1999) over [[mrrQueries]]: rank the
    * corpus per query via the one-token-pass
    * [[graft.llm.Index.bm25SearchMulti]] kernel (top-100 cap), find the
    * first AND-relevant hit, and report per-query reciprocal rank in
    * integer micro-units (1e6 div rank; 0 and first_rank = −1 when no
    * relevant doc ranks) plus the suite MRR. Every number is integer
    * arithmetic over deterministic ranks — the oracle replays the shared
    * token pass, the per-query rank windows, and the micro-unit folds.
    * Scale shape: one corpus token pass for all queries; ranking windows
    * run per-qid over term-matching candidates only (WindowGroupLimit
    * prunes before the shuffle); everything after is a 5-row relation
    * (its global window is bounded by the query count). */
  protected def llmSearchMrr(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Index.bm25SearchMulti(t(spark, dir, "documents"),
      "doc_id", "text",
      mrrQueries.map { case (q, a, b) => (q, Seq(a, b)) }, k = 100)
    val per = ranked.groupBy("qid").agg(
      count(lit(1)).as("n_candidates"),
      sum(when(col("n_terms_matched") === 2, 1L).otherwise(0L))
        .as("n_relevant_topk"),
      coalesce(min(when(col("n_terms_matched") === 2, col("r"))), lit(-1L))
        .as("first_rank"))
    // Broadcast the ≤|queries|-row aggregate (the BUILD side); a hint on
    // the preserved left of a left join is a planner no-op (r15 ADVICE).
    mrrQueries.toDF("qid", "term_a", "term_b")
      .join(broadcast(per), Seq("qid"), "left")
      .select(col("qid"), col("term_a"), col("term_b"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_relevant_topk"), lit(0L)).as("n_relevant_topk"),
        coalesce(col("first_rank"), lit(-1L)).as("first_rank"))
      .withColumn("rr_micro", expr(
        "CASE WHEN first_rank > 0 THEN 1000000 div first_rank " +
          "ELSE CAST(0 AS BIGINT) END"))
      .withColumn("mrr_micro", expr(
        s"CAST(sum(rr_micro) OVER () AS BIGINT) div ${mrrQueries.size}"))
      .orderBy("qid")
  }

  private val ndcgK = 10

  /** Fixed-point DCG position weights ⌊10⁶/log₂(i+1) + ½⌋ for ranks
    * 1..10, computed once and EMBEDDED AS LITERALS into both engines'
    * expressions (the DCT-basis precedent from phash: one shared
    * constant table, so no float drift can exist between engines). */
  private val ndcgW: IndexedSeq[Long] = (1 to ndcgK).map(i =>
    math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)

  /** Σ_{r≤10} gain·W_r over ranked rows — emitted once for both engines
    * (pure integer CASE lookup, engine-neutral SQL). */
  private def ndcgDcgSum(rCol: String, gCol: String): String = {
    val cases = (1 to ndcgK).map(i => s"WHEN $i THEN ${ndcgW(i - 1)}")
      .mkString(" ")
    s"sum((CASE $rCol $cases ELSE 0 END) * $gCol)"
  }

  /** Ideal DCG@10 from the pool's grade counts alone (n₂ rel-2 docs
    * fill the top ranks at gain 3, then n₁ rel-1 docs at gain 1) — no
    * sort needed, emitted once for both engines. */
  private def ndcgIdealSum(n2: String, n1: String): String =
    (1 to ndcgK).map(i =>
      s"(CASE WHEN $i <= $n2 THEN ${3 * ndcgW(i - 1)} " +
        s"WHEN $i <= $n2 + $n1 THEN ${ndcgW(i - 1)} ELSE 0 END)")
      .mkString(" + ")

  /** NDCG@10 of BM25 retrieval (Järvelin & Kekäläinen 2002) over the
    * same [[mrrQueries]] suite and the same one-token-pass
    * [[graft.llm.Index.bm25SearchMulti]] kernel as [[llmSearchMrr]] —
    * the GRADED companion to MRR's binary read: relevance 2 when a doc
    * holds both query terms, 1 for one term, gain 2^rel − 1, and the
    * ideal ordering normalizes within the retrieved top-100 pool (the
    * TREC pooling reality — judgments only exist for what was
    * retrieved). FULLY integer: position weights are the shared
    * [[ndcgW]] literal table, DCG is one CASE-lookup sum, IDCG needs
    * only the pool's (n₂, n₁) grade counts, and NDCG is one
    * non-negative truncating division at 10⁻⁶ scale. Scale shape:
    * identical to MRR — one corpus token pass, per-qid rank windows
    * over term-matching candidates, then a 5-row relation whose global
    * window is bounded by the query count. */
  protected def llmSearchNdcg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Index.bm25SearchMulti(t(spark, dir, "documents"),
      "doc_id", "text",
      mrrQueries.map { case (q, a, b) => (q, Seq(a, b)) }, k = 100)
    val per = ranked
      .withColumn("g", expr(
        "CASE n_terms_matched WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END"))
      .groupBy("qid").agg(
        count(lit(1)).as("n_candidates"),
        expr(ndcgDcgSum("r", "g")).cast("long").as("dcg_micro"),
        sum(when(col("n_terms_matched") === 2, 1L).otherwise(0L)).as("n2"),
        sum(when(col("n_terms_matched") === 1, 1L).otherwise(0L)).as("n1"))
    mrrQueries.toDF("qid", "term_a", "term_b")
      .join(broadcast(per), Seq("qid"), "left")
      .select(col("qid"), col("term_a"), col("term_b"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"))
      .withColumn("idcg_micro",
        expr(ndcgIdealSum("n2", "n1")).cast("long"))
      .withColumn("ndcg_micro", expr(
        "CASE WHEN idcg_micro > 0 THEN dcg_micro * 1000000 div idcg_micro" +
          " ELSE CAST(0 AS BIGINT) END"))
      .withColumn("mean_ndcg_micro", expr(
        s"CAST(sum(ndcg_micro) OVER () AS BIGINT) div ${mrrQueries.size}"))
      .orderBy("qid")
  }

  /** The generated DuckDB replay of [[llmSearchNdcg]]: the shared BM25
    * token-pass CTE chain (identical to the MRR oracle through `rk`),
    * then the DCG/IDCG folds emitted from the same generators. */
  protected def ndcgOracle: String =
    s"""WITH q(qid, term_a, term_b) AS (VALUES
           (CAST(1 AS BIGINT), 'data', 'query'), (2, 'spark', 'join'),
           (3, 'hash', 'merge'), (4, 'scan', 'filter'),
           (5, 'stream', 'window')),
       qt AS (SELECT qid, term_a AS term FROM q
              UNION ALL SELECT qid, term_b FROM q),
       tk AS (SELECT doc_id,
           unnest(string_split_regex(trim(text), '\\s+')) AS term
         FROM documents),
       dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
       tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
              WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
       df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl
              FROM dl),
       c AS (SELECT tf.doc_id, tf.term,
           CAST(floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                 * (tf.tf * CAST(2.2 AS DOUBLE))
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                 * 10000 + 0.5) AS BIGINT) AS c4
         FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st),
       s AS (SELECT qt.qid, c.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           CAST(sum(c4) AS DOUBLE) / 10000.0 AS score
         FROM c JOIN qt USING (term) GROUP BY 1, 2),
       rk AS (SELECT *, CAST(row_number() OVER (
             PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS r
         FROM s),
       g AS (SELECT qid, r,
           CASE n_terms_matched WHEN 2 THEN 3 WHEN 1 THEN 1 ELSE 0 END
             AS g,
           n_terms_matched
         FROM rk WHERE r <= 100),
       per AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_candidates,
           CAST(${ndcgDcgSum("r", "g")} AS BIGINT) AS dcg_micro,
           CAST(sum(CASE WHEN n_terms_matched = 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n2,
           CAST(sum(CASE WHEN n_terms_matched = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n1
         FROM g GROUP BY 1),
       fin AS (SELECT q.qid, q.term_a, q.term_b,
           CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(coalesce(n2, 0) AS BIGINT) AS n2,
           CAST(coalesce(n1, 0) AS BIGINT) AS n1,
           CAST(coalesce(dcg_micro, 0) AS BIGINT) AS dcg_micro,
           CAST(${ndcgIdealSum("coalesce(n2, 0)", "coalesce(n1, 0)")}
             AS BIGINT) AS idcg_micro
         FROM q LEFT JOIN per USING (qid)),
       fin2 AS (SELECT *,
           CAST(CASE WHEN idcg_micro > 0
             THEN dcg_micro * 1000000 // idcg_micro
             ELSE 0 END AS BIGINT) AS ndcg_micro
         FROM fin)
       SELECT qid, term_a, term_b, n_candidates, n2, n1, dcg_micro,
         idcg_micro, ndcg_micro,
         CAST((SELECT sum(ndcg_micro) FROM fin2) AS BIGINT)
           // ${mrrQueries.size} AS mean_ndcg_micro
       FROM fin2 ORDER BY qid"""

  /** Heaps'-law vocabulary-growth curve (Heaps 1978): distinct-term
    * count vs cumulative token volume at doc-id milestones — the curve
    * that sizes a tokenizer's vocab and says when a corpus stops
    * yielding new types. Scale shape: ONE term→min(first_doc) aggregate
    * over the corpus and ONE token-count scan, each collapsed by SIX
    * codegen'd conditional aggregates to a single row, then reshaped by
    * `stack` — no join at all. (The previous shape left-joined the
    * milestones against the vocab-/doc-sized relations with a broadcast
    * hint on the PRESERVED side — a planner no-op (r15 ADVICE class),
    * so the fallback BNLJ would have broadcast the corpus-sized side
    * at scale.) */
  protected def llmHeaps(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val first = docs.select(
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("term"),
        col("doc_id"))
      .groupBy("term").agg(min("doc_id").as("first_doc"))
    val ntok = docs.select(col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("ntok"))
    val milestones = Seq(64L, 256L, 1024L, 4096L, 16384L, 65536L)
    val vocabRow = first.agg(
      count(when(col("first_doc") < milestones.head, 1L)).as("v0"),
      milestones.tail.zipWithIndex.map { case (m, i) =>
        count(when(col("first_doc") < m, 1L)).as(s"v${i + 1}")
      }: _*)
    val volRow = ntok.agg(
      coalesce(sum(when(col("doc_id") < milestones.head, col("ntok"))),
        lit(0L)).as("t0"),
      milestones.tail.zipWithIndex.map { case (m, i) =>
        coalesce(sum(when(col("doc_id") < m, col("ntok"))), lit(0L))
          .as(s"t${i + 1}")
      }: _*)
    val stackArgs = milestones.zipWithIndex
      .map { case (m, i) => s"${m}L, t$i, v$i" }.mkString(", ")
    vocabRow.crossJoin(volRow)
      .select(expr(s"stack(${milestones.size}, $stackArgs)")
        .as(Seq("milestone_doc", "corpus_tokens", "vocab")))
      .orderBy("milestone_doc")
  }

  /** Zipf rank-frequency diagnostic (Zipf 1949): the top-50 terms with
    * their rank·frequency product — near-constant on natural language,
    * and the sibling curve to [[llmHeaps]] (vocab growth) in the
    * corpus-health report. Exactness: counts are integers and the rank
    * product stays integer, so there is nothing to round. The ranking
    * window runs over the ALREADY top-50-limited relation (TakeOrdered
    * cuts the vocab-sized counts first — the window never sees the
    * corpus or the vocabulary). */
  protected def llmZipf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = t(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term")).limit(50)
    freq.withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("term")))
          .cast("long"))
      .select(col("rank"), col("term"), col("freq"),
        (col("rank") * col("freq")).as("rank_freq"))
      .orderBy("rank")
  }

  /** Language-ID confusion matrix — the classifier-quality eval the
    * labeled corpus makes possible (actual `lang` column × detected
    * [[TextAnalysis.langId]]): which languages the stopword heuristic
    * confuses, and where its 'und'/zh blind spot lands. The eval-loop
    * sibling of [[llmAnnRecall]] — measure the operator, don't trust
    * it. Pure counts; one groupBy. */
  protected def llmLangidEval(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang").as("actual_lang"),
        TextAnalysis.langId(col("text")).as("detected_lang"))
      .groupBy("actual_lang", "detected_lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_match", col("actual_lang") === col("detected_lang"))
      .orderBy("actual_lang", "detected_lang")

  /** Flesch reading-ease scoring (Flesch 1948; the readability gate a
    * curation pipeline pairs with Gopher/CCNet quality rules) over the
    * mod-31 document sample. Components are pure integer counts —
    * whitespace tokens, [.!?]+ sentence runs, [aeiouy]+ vowel-group
    * syllables with a 1-per-word floor — and the score keeps Flesch's
    * coefficients in milli-units with truncating integer division at
    * every step (all operands positive, so Spark's div ≡ DuckDB's //).
    * Row-local regex work; one orderBy at the surface. */
  protected def llmReadability(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(31)) === 0)
      .select(col("doc_id"),
        size(toks).cast("long").as("n_words"),
        greatest(size(regexp_extract_all(col("text"), lit("[.!?]+"),
          lit(0))), lit(1)).cast("long").as("n_sentences"),
        aggregate(
          transform(toks, w => greatest(size(regexp_extract_all(lower(w),
            lit("[aeiouy]+"), lit(0))), lit(1)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_syllables"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"),
        expr("206835 - (1015 * ((1000 * n_words) div n_sentences)) div 1000" +
          " - (84600 * ((1000 * n_syllables) div n_words)) div 1000")
          .as("flesch_milli"))
      .orderBy("doc_id")
  }

  /** T5-style span-corruption plan (Raffel et al. 2020: mask contiguous
    * spans, one sentinel per span — input length = tokens − masked +
    * sentinels): deterministic md5 channels pick ~5% span STARTS and a
    * 1–3 token length each; overlapping/adjacent spans merge into
    * islands via a BOUNDED 2-preceding running-max window (span ends
    * can't reach further) + a lag edge-detect — per-doc windows only,
    * nothing corpus-wide. Output per sampled doc: token/span/masked
    * counts, the resulting input length, and an order-invariant
    * coverage checksum the oracle replays position for position. */
  protected def llmMaskSpans(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(41)) === 0)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
    def h(tag: String) = conv(substring(md5(concat(
        col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"), lit(":" + tag))), 1, 8), 16, 10)
      .cast("long")
    val st = tok.withColumn("slen",
      when(pmod(h("spanstart"), lit(20)) === 0,
        pmod(h("spanlen"), lit(3)) + 1).otherwise(lit(0L)))
    val wCov = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(-2, Window.currentRow)
    val wLag = Window.partitionBy("doc_id").orderBy("pos")
    val cov = st.withColumn("covered",
      when(max(when(col("slen") > 0, col("pos") + col("slen") - 1)
          .otherwise(lit(-1L))).over(wCov) >= col("pos"), 1L)
        .otherwise(0L))
    val isl = cov.withColumn("is_start",
      when(col("covered") === 1 &&
        coalesce(lag(col("covered"), 1).over(wLag), lit(0L)) === 0, 1L)
        .otherwise(0L))
    isl.groupBy("doc_id").agg(
        count(lit(1)).as("n_tokens"),
        sum(col("is_start")).as("n_spans"),
        sum(col("covered")).as("n_masked"),
        (count(lit(1)) - sum(col("covered")) + sum(col("is_start")))
          .as("input_len"),
        sum(when(col("covered") === 1, col("pos") + 1).otherwise(0L))
          .as("cover_checksum"))
      .orderBy("doc_id")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004) over the
    * documents corpus: adjacent-token co-occurrence graph (self-loops
    * dropped, symmetrized, weight = adjacency count) ranked by weighted
    * PageRank ([[graft.operators.WeightedPageRank]], 6 rounds), top-20
    * keywords. The corpus-sized work is ONE windowed lead + ONE count
    * aggregate building the ≤|vocab|² edge relation; every rank round
    * then runs on that vocabulary-sized graph. Generated lockstep
    * oracle replays tokenization, graph build, and all 6 rounds. */
  protected def llmKeywordsTextrank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val toks = t(spark, dir, "documents").select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") =!= col("tok"))
    val edges = toks.select(col("tok").as("src"), col("nxt").as("dst"))
      .unionAll(toks.select(col("nxt").as("src"), col("tok").as("dst")))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
    graft.operators.WeightedPageRank.run(edges, "src", "dst", "w",
        iterations = 6)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
      .select(col("node").as("keyword"), col("rank"))
  }

  protected val llmSearchOracleSql: ListMap[String, String] = ListMap(
    "q_llm_search_ndcg" -> ndcgOracle,
    // Independent derivation of the co-occurrence counts: positions table
    // self-joined on window distance (exact, quadratic-ish — oracle scale
    // only) vs the engine's array-side shifted zips; PMI mirrored op for op.
    "q_llm_cooccur_pmi" ->
      """WITH tokl AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\s+') END AS ts
             FROM documents),
         tok AS (SELECT doc_id, i, ts[CAST(i + 1 AS INT)] AS tok
                 FROM tokl, unnest(range(len(ts))) u(i)),
         pr AS (SELECT a.tok AS tok_a, b.tok AS tok_b
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                  AND b.i - a.i BETWEEN 1 AND 2),
         pc AS (SELECT tok_a, tok_b, count(*) AS n_pair FROM pr
                GROUP BY tok_a, tok_b HAVING count(*) >= 5),
         uni AS (SELECT tok, count(*) AS n FROM tok GROUP BY tok),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt FROM tok),
         totp AS (SELECT CAST(count(*) AS DOUBLE) AS np FROM pr)
         SELECT tok_a, tok_b, CAST(n_pair AS BIGINT) AS n_pair,
           floor(ln(CAST(n_pair AS DOUBLE) * nt * nt
               / (np * CAST(ua.n AS DOUBLE) * CAST(ub.n AS DOUBLE)))
             * 10000 + CAST(0.5 AS DOUBLE)) / 10000 AS pmi
         FROM pc JOIN uni ua ON pc.tok_a = ua.tok
                 JOIN uni ub ON pc.tok_b = ub.tok, tot, totp
         ORDER BY tok_a, tok_b""",
    "q_llm_vocab" ->
      """SELECT gram, count(*) AS freq
         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS gram
               FROM documents)
         GROUP BY gram ORDER BY freq DESC, gram LIMIT 100""",
    // Same relational LM both sides: add-one-smoothed bigram log-probs,
    // rounded per term then DECIMAL-summed so FP order never matters.
    "q_llm_lm_score" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                     FROM documents),
         g AS (SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t)),
                             i -> t[i] || ' ' || t[i+1]) END AS grams
               FROM tk),
         dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         big AS (SELECT gram, count(*) AS c2 FROM dg GROUP BY gram),
         unic AS (SELECT tok, count(*) AS c1
                  FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
         v AS (SELECT count(*) AS vs FROM unic),
         terms AS (SELECT d.doc_id,
                     floor(ln((COALESCE(b.c2, 0) + 1.0)
                       / (COALESCE(u.c1, 0) + v.vs)) * 1e8 + 0.5) / 1e8 AS logp
                   FROM dg d
                   LEFT JOIN big b USING (gram)
                   LEFT JOIN unic u ON string_split(d.gram, ' ')[1] = u.tok
                   CROSS JOIN v)
         SELECT doc_id, count(*) AS n_bigrams,
                floor(CAST(SUM(CAST(logp AS DECIMAL(28,8))) AS DOUBLE)
                  / count(*) * 1e6 + 0.5) / 1e6 AS avg_logp
         FROM terms GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_lm_kn" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                     FROM documents),
         g AS (SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t)),
                             i -> t[i] || ' ' || t[i+1]) END AS grams
               FROM tk),
         dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         big AS (SELECT gram, count(*) AS c2 FROM dg GROUP BY gram),
         unic AS (SELECT tok, count(*) AS c1
                  FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
         v AS (SELECT count(*) AS vs FROM unic),
         bt AS (SELECT count(*) AS bt FROM big),
         fwd AS (SELECT string_split(gram, ' ')[1] AS w1, count(*) AS nf
                 FROM big GROUP BY 1),
         bwd AS (SELECT string_split(gram, ' ')[2] AS w2, count(*) AS nb
                 FROM big WHERE string_split(gram, ' ')[2] IS NOT NULL
                 GROUP BY 1),
         terms AS (SELECT d.doc_id,
                     CASE WHEN f.nf IS NOT NULL THEN
                       greatest(CAST(COALESCE(b.c2, 0) AS DOUBLE)
                           - CAST(0.5 AS DOUBLE), CAST(0 AS DOUBLE))
                         / u.c1
                       + (CAST(0.5 AS DOUBLE) * f.nf / u.c1)
                         * ((COALESCE(w.nb, 0) + CAST(1.0 AS DOUBLE))
                            / (CAST(bt.bt AS DOUBLE) + CAST(v.vs AS DOUBLE)))
                     ELSE (COALESCE(w.nb, 0) + CAST(1.0 AS DOUBLE))
                          / (CAST(bt.bt AS DOUBLE) + CAST(v.vs AS DOUBLE))
                     END AS p
                   FROM dg d
                   LEFT JOIN big b USING (gram)
                   LEFT JOIN unic u ON string_split(d.gram, ' ')[1] = u.tok
                   LEFT JOIN fwd f ON string_split(d.gram, ' ')[1] = f.w1
                   LEFT JOIN bwd w ON string_split(d.gram, ' ')[2] = w.w2
                   CROSS JOIN v CROSS JOIN bt),
         lg AS (SELECT doc_id,
                  floor(ln(p) * 1e8 + 0.5) / 1e8 AS logp FROM terms)
         SELECT doc_id, count(*) AS n_bigrams,
                floor(CAST(SUM(CAST(logp AS DECIMAL(28,8))) AS DOUBLE)
                  / count(*) * 1e6 + 0.5) / 1e6 AS kn_logp
         FROM lg GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_postings" ->
      """WITH tk AS (SELECT DISTINCT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                     FROM documents)
         SELECT term, count(*) AS df,
                array_to_string((list(doc_id ORDER BY doc_id))[1:20], ',') AS postings
         FROM tk GROUP BY term ORDER BY term""",
    "q_llm_tfidf" ->
      """WITH tk AS (SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                     FROM documents),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
           df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
           s AS (SELECT doc_id, term, tf,
                   floor(tf * ln(nd / df) * 10000 + 0.5) / 10000 AS tfidf
                 FROM tf JOIN df USING (term), n)
         SELECT doc_id, term, tf, tfidf FROM s
         QUALIFY row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term) <= 3
         ORDER BY doc_id, tfidf DESC, term""",
    "q_llm_bm25" ->
      """WITH tk AS (SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                     FROM documents),
           tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2),
           dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
           df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM dl),
           s AS (SELECT tf.doc_id, tf.term, tf.tf,
                   -- CAST(2.2 AS DOUBLE): bare 2.2 is DECIMAL(2,1), and
                   -- BIGINT*DECIMAL computes the decimal-exact product
                   -- before converting — 1 ulp off Spark's double multiply,
                   -- enough to flip a floor(x*1e4+0.5) boundary.
                   floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                         * (tf.tf * CAST(2.2 AS DOUBLE))
                         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                         * 10000 + 0.5) / 10000 AS bm25
                 FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st)
         SELECT doc_id, term, tf, bm25 FROM s
         QUALIFY row_number() OVER (PARTITION BY doc_id
                                    ORDER BY bm25 DESC, term) <= 3
         ORDER BY doc_id, bm25 DESC, term""",
    "q_llm_langid" ->
      """WITH hits AS (SELECT
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS en,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('der','die','das','und','ist','von','zu','mit','auf','ein'))) AS de,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('le','la','les','de','et','est','un','une','que','pour'))) AS fr,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('el','la','los','de','y','es','un','una','que','por'))) AS es
           FROM documents),
         det AS (SELECT CASE
             WHEN greatest(en, de, fr, es) = 0 THEN 'und'
             WHEN en = greatest(en, de, fr, es) THEN 'en'
             WHEN de = greatest(en, de, fr, es) THEN 'de'
             WHEN fr = greatest(en, de, fr, es) THEN 'fr'
             ELSE 'es' END AS detected_lang FROM hits)
         SELECT detected_lang, count(*) AS n FROM det
         GROUP BY detected_lang ORDER BY detected_lang""",
    "q_llm_nfc" ->
      """SELECT doc_id,
           md5(nfc_normalize(text || 'e' || chr(769))) AS norm_hash,
           length(nfc_normalize(text || 'e' || chr(769))) AS norm_chars
         FROM documents ORDER BY doc_id""",
    "q_llm_repetition" ->
      """WITH m AS (SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN text || chr(10) || text ELSE text END AS t
           FROM documents),
         l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM m)
         SELECT doc_id,
           floor(CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
             / len(ls) * 10000 + 0.5) / 10000 AS dup_line_frac,
           CASE WHEN list_sum(list_transform(ls, x -> length(x))) > 0 THEN
             floor(CAST(list_sum(list_transform(ls, x -> length(x)))
                 - list_sum(list_transform(list_distinct(ls), x -> length(x))) AS DOUBLE)
               / list_sum(list_transform(ls, x -> length(x))) * 10000 + 0.5) / 10000
           ELSE 0.0 END AS dup_line_char_frac
         FROM l ORDER BY doc_id""",
    "q_llm_tokens" ->
      """SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish,
           length(text) AS n_chars_computed
         FROM documents ORDER BY doc_id""",
    "q_llm_top_ngram" ->
      """WITH tk AS (SELECT doc_id, length(text) AS nchars,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         gr AS (SELECT doc_id, nchars, n, array_to_string(t[i:i+n-1], ' ') AS g
           FROM (SELECT doc_id, nchars, t, n,
                   unnest(range(1, len(t) - n + 2)) AS i
                 FROM tk, (VALUES (2), (3), (4)) nn(n))),
         cnts AS (SELECT doc_id, nchars, n, g, count(*) AS cnt
                  FROM gr GROUP BY doc_id, nchars, n, g),
         top AS (SELECT doc_id, n,
                   floor(max(cnt * length(g)) / nchars * 10000 + 0.5) / 10000
                     AS frac
                 FROM cnts GROUP BY doc_id, n, nchars)
         SELECT d.doc_id,
           coalesce(max(CASE WHEN n = 2 THEN frac END), 0.0) AS top2_frac,
           coalesce(max(CASE WHEN n = 3 THEN frac END), 0.0) AS top3_frac,
           coalesce(max(CASE WHEN n = 4 THEN frac END), 0.0) AS top4_frac
         FROM documents d LEFT JOIN top ON d.doc_id = top.doc_id
         GROUP BY d.doc_id ORDER BY d.doc_id""",
    "q_llm_boilerplate" ->
      """WITH d AS (SELECT doc_id,
             text || chr(10) || 'Copyright 2024 Example Corp. All rights reserved.'
                  || chr(10) || 'Subscribe to our newsletter today!' AS dirty
           FROM documents),
         c AS (SELECT doc_id, dirty,
             array_to_string(list_filter(string_split(dirty, chr(10)),
               l -> NOT regexp_matches(lower(l),
                 '(all rights reserved|cookie|subscribe|sign up|click here|terms of service|privacy policy|copyright|©)')),
               chr(10)) AS clean
           FROM d)
         SELECT doc_id,
           len(string_split(dirty, chr(10))) AS n_lines_in,
           len(string_split(clean, chr(10))) AS n_lines_kept,
           md5(clean) AS clean_hash
         FROM c ORDER BY doc_id""",
    "q_llm_html_extract" ->
      """WITH h AS (SELECT doc_id,
             '<html><head><title>T</title><style>p { color: red; }</style>'
             || '<script>if (a < b && c > 0) { alert("x"); }</script></head>'
             || '<body>' || chr(10) || '<h1 class="hd">Doc ' || doc_id
             || '</h1>' || chr(10) || '<p>' || text
             || '</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot;&nbsp;&#39;q&#39;</div>'
             || '<ul><li>one</li><li>two</li></ul></body></html>' AS html
           FROM documents),
         s1 AS (SELECT doc_id, regexp_replace(regexp_replace(
             regexp_replace(html, '\r\n?', chr(10), 'g'),
             '(?is)<script(>|[\s/][^>]*>).*?</script>', '', 'g'),
             '(?is)<style(>|[\s/][^>]*>).*?</style>', '', 'g') AS t FROM h),
         s2 AS (SELECT doc_id, regexp_replace(regexp_replace(t,
             '(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h1|h2|h3|h4|h5|h6)(>|[\s/][^>]*>)',
             chr(10), 'g'),
             '<[^>]*>', '', 'g') AS t FROM s1),
         s3 AS (SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(t,
               '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
               '&#39;', '''', 'g'), '&apos;', '''', 'g'), '&nbsp;', ' ', 'g'),
               '&amp;', '&', 'g') AS t FROM s2),
         s4 AS (SELECT doc_id, trim(regexp_replace(regexp_replace(t,
             '[ \t]*\n[ \t\n]*', chr(10), 'g'), '[ \t]+', ' ', 'g'),
             ' ' || chr(10)) AS txt FROM s3)
         SELECT doc_id, length(txt) AS n_chars,
           len(string_split(txt, chr(10))) AS n_lines,
           md5(txt) AS txt_hash
         FROM s4 ORDER BY doc_id""",
    // GENERATED full merge-learning replay (Bpe.oracleCtes): DuckDB
    // re-runs all 8 rounds — pair counts, tie-broken argmax, recursive
    // leftmost merge application — and must reproduce the merge table
    // and the top-10 words' training segmentations.
    "q_llm_bpe_det" -> (graft.llm.Bpe.oracleCtes("doc_id < 50",
      numMerges = 8) + s""",
      top AS MATERIALIZED (
        SELECT word, row_number() OVER (ORDER BY freq DESC, word) AS ord
        FROM wf ORDER BY freq DESC, word LIMIT 10)
      SELECT kind, ord, s1, s2 FROM (
        SELECT 'merge' AS kind, CAST(r AS BIGINT) AS ord, a AS s1, b AS s2
        FROM (${(1 to 8).map(r =>
          s"SELECT $r AS r, a, b FROM b$r").mkString(" UNION ALL ")})
        UNION ALL
        SELECT 'word', CAST(t.ord AS BIGINT), t.word,
          array_to_string(list_filter(string_split(w8.state, chr(1)),
            x -> x <> ''), chr(1))
        FROM top t JOIN w8 ON w8.word = t.word)
      ORDER BY kind, ord"""),
    "q_llm_oov_rate" ->
      """WITH tk AS (SELECT unnest(string_split_regex(trim(text), '\s+'))
             AS token
           FROM documents WHERE trim(text) <> ''),
         v AS (SELECT gram AS token FROM (
             SELECT gram, count(*) AS freq FROM (
               SELECT unnest(string_split_regex(trim(text), '\s+')) AS gram
               FROM documents WHERE trim(text) <> '') GROUP BY gram)
           ORDER BY freq DESC, gram LIMIT 50),
         j AS (SELECT tk.token,
             CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
           FROM tk LEFT JOIN v ON tk.token = v.token)
         SELECT CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           floor(sum(oov) * 10000.0 / count(*) + 0.5) / 10000 AS oov_rate,
           CAST(count(DISTINCT token) AS BIGINT) AS n_types,
           CAST(count(DISTINCT CASE WHEN oov = 1 THEN token END) AS BIGINT)
             AS n_oov_types,
           floor(count(DISTINCT CASE WHEN oov = 1 THEN token END) * 10000.0
             / count(DISTINCT token) + 0.5) / 10000 AS type_oov_rate
         FROM j""",
    // Same per-term floor(x·1e4+0.5) integer contributions, summed
    // exactly, then one surface division — order-independent both sides.
    "q_llm_search_bm25" ->
      """WITH tk AS (SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                     FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
           qt AS (SELECT doc_id, term, count(*) AS tf FROM tk
                  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
           df AS (SELECT term, count(*) AS df FROM qt GROUP BY 1),
           st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM dl),
           s AS (SELECT qt.doc_id,
                   CAST(floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                         * (qt.tf * CAST(2.2 AS DOUBLE))
                         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                         * 10000 + 0.5) AS BIGINT) AS c4
                 FROM qt JOIN dl USING (doc_id) JOIN df USING (term), st)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms_matched,
                CAST(SUM(c4) AS DOUBLE) / 10000.0 AS score
         FROM s GROUP BY doc_id
         ORDER BY score DESC, doc_id LIMIT 10""",
    // MRR replay: the shared token pass, the identical c4 unit formula,
    // per-qid rank windows, and the micro-unit reciprocal-rank folds.
    "q_llm_search_mrr" ->
      """WITH q(qid, term_a, term_b) AS (VALUES
             (CAST(1 AS BIGINT), 'data', 'query'), (2, 'spark', 'join'),
             (3, 'hash', 'merge'), (4, 'scan', 'filter'),
             (5, 'stream', 'window')),
         qt AS (SELECT qid, term_a AS term FROM q
                UNION ALL SELECT qid, term_b FROM q),
         tk AS (SELECT doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tk
                WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl
                FROM dl),
         c AS (SELECT tf.doc_id, tf.term,
             CAST(floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                   * (tf.tf * CAST(2.2 AS DOUBLE))
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                   * 10000 + 0.5) AS BIGINT) AS c4
           FROM tf JOIN dl USING (doc_id) JOIN df USING (term), st),
         s AS (SELECT qt.qid, c.doc_id,
             CAST(count(*) AS BIGINT) AS n_terms_matched,
             CAST(sum(c4) AS DOUBLE) / 10000.0 AS score
           FROM c JOIN qt USING (term) GROUP BY 1, 2),
         rk AS (SELECT *, CAST(row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS r
           FROM s),
         per AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_candidates,
             CAST(sum(CASE WHEN n_terms_matched = 2 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_relevant_topk,
             CAST(coalesce(min(CASE WHEN n_terms_matched = 2 THEN r END),
               -1) AS BIGINT) AS first_rank
           FROM rk WHERE r <= 100 GROUP BY 1),
         fin AS (SELECT q.qid, q.term_a, q.term_b,
             CAST(coalesce(n_candidates, 0) AS BIGINT) AS n_candidates,
             CAST(coalesce(n_relevant_topk, 0) AS BIGINT) AS n_relevant_topk,
             CAST(coalesce(first_rank, -1) AS BIGINT) AS first_rank,
             CAST(CASE WHEN coalesce(first_rank, -1) > 0
               THEN 1000000 // first_rank ELSE 0 END AS BIGINT) AS rr_micro
           FROM q LEFT JOIN per USING (qid))
         SELECT qid, term_a, term_b, n_candidates, n_relevant_topk,
           first_rank, rr_micro,
           CAST((SELECT sum(rr_micro) FROM fin) AS BIGINT) // 5 AS mrr_micro
         FROM fin ORDER BY qid""",
    // Positional replay via indexed list_transform (1-based i → pos i−1,
    // matching posexplode); adjacency is the same (doc, pos+1) equi-join.
    "q_llm_phrase_search" ->
      """WITH tk AS (SELECT doc_id, s.u.pos - 1 AS pos, s.u.term AS term
                     FROM (SELECT doc_id,
                             unnest(list_transform(
                               string_split_regex(trim(text), '\s+'),
                               (x, i) -> {'term': x, 'pos': i})) AS u
                           FROM documents) s),
           a AS (SELECT doc_id, pos FROM tk WHERE term = 'data'),
           b AS (SELECT doc_id, pos - 1 AS pos FROM tk WHERE term = 'query')
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
         FROM a JOIN b USING (doc_id, pos)
         GROUP BY doc_id ORDER BY n_occurrences DESC, doc_id LIMIT 10""",
    // Same 2×2 integer table; N·(ad−bc)² in HUGEINT; two double casts,
    // one floored 4 dp division.
    "q_llm_term_drift" ->
      """WITH docs AS (SELECT source, doc_id, text FROM documents
                       WHERE source IN ('src0', 'src1')),
           nn AS (SELECT
               CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
               CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n2
             FROM docs),
           tk AS (SELECT DISTINCT source, doc_id, t.term
                  FROM docs, unnest(string_split_regex(trim(text), '\s+')) AS t(term)),
           ab AS (SELECT term,
               CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS b
             FROM tk GROUP BY term),
           x AS (SELECT term, a, b, n1 - a AS c, n2 - b AS d, n1, n2
                 FROM ab, nn)
         SELECT term, a, b,
           floor(CAST(CAST(n1 + n2 AS HUGEINT) * (a*d - b*c) * (a*d - b*c)
                   AS DOUBLE)
                 / CAST((a + b) * (c + d) * n1 * n2 AS DOUBLE) * 10000) / 10000
             AS chi4
         FROM x
         WHERE (a + b) > 0 AND (c + d) > 0
         ORDER BY chi4 DESC, term LIMIT 10""",
    // TextRank replay: same tokenization as q_llm_vocab; adjacency via
    // list_zip(ts, ts[2:]) (the ann_brute pairing idiom — DuckDB's range()
    // can't take lateral column bounds), NULL-padded tail dropped like
    // Spark's lead() null.
    "q_llm_keywords" -> (graft.operators.WeightedPageRank.oracleCtes(
      """WITH adjp AS (
           SELECT p[1] AS x, p[2] AS y FROM (
             SELECT unnest(list_zip(ts, ts[2:])) AS p
             FROM (SELECT string_split_regex(trim(text), '\s+') AS ts
                   FROM documents))
           WHERE p[2] IS NOT NULL AND p[1] <> p[2])
         SELECT x AS src, y AS dst, 1 AS w FROM adjp
         UNION ALL
         SELECT y, x, 1 FROM adjp""",
      iterations = 6) +
      """
         SELECT node AS keyword,
           FLOOR(rank * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9 AS rank
         FROM r6 ORDER BY rank DESC, node LIMIT 20"""),
    // Full masking replay: scalar range(0, len) + list_zip gives each
    // token its 0-based position, then the same three md5 channels drive
    // select/branch/pick identically.
    "q_llm_mask_tokens" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
                    FROM documents WHERE doc_id % 37 = 0),
         tok AS (SELECT doc_id, ts, p[1] AS tok, p[2] AS pos FROM (
                   SELECT doc_id, ts,
                          unnest(list_zip(ts, range(0, len(ts)))) AS p
                   FROM d)),
         sel0 AS (SELECT doc_id, ts, tok, pos,
                    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                       CAST(pos AS VARCHAR) || ':sel'), 1, 8))::BIGINT % 100
                      AS h1
                  FROM tok),
         sel AS (SELECT doc_id, ts, tok, pos,
                   CASE WHEN h1 < 15 THEN
                     ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                        CAST(pos AS VARCHAR) || ':op'), 1, 8))::BIGINT % 10
                   ELSE -1 END AS op
                 FROM sel0),
         sw AS (SELECT doc_id, tok, pos, op,
                  CASE WHEN op = 8 THEN ts[CAST(
                    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                       CAST(pos AS VARCHAR) || ':pick'), 1, 8))::BIGINT
                      % len(ts) + 1 AS BIGINT)]
                  END AS swap_tok
                FROM sel)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN op >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(SUM(CASE WHEN op BETWEEN 0 AND 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
           CAST(SUM(CASE WHEN op = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_swapped,
           CAST(SUM(CASE WHEN op = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN op = 8 THEN length(swap_tok) END), 0) AS BIGINT) AS swap_len_sum,
           CAST(SUM(CASE WHEN op >= 0 THEN (pos + 1) * (op + 1) ELSE 0 END) AS BIGINT) AS decision_checksum
         FROM sw GROUP BY doc_id ORDER BY doc_id""",
    // Span replay: same start/length channels, the same bounded
    // 2-preceding running-max coverage window, lag edge-detect islands.
    "q_llm_mask_spans" ->
      """WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
                    FROM documents WHERE doc_id % 41 = 0),
         tok AS (SELECT doc_id, p[2] AS pos FROM (
                   SELECT doc_id,
                          unnest(list_zip(ts, range(0, len(ts)))) AS p
                   FROM d)),
         st AS (SELECT doc_id, pos,
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                         CAST(pos AS VARCHAR) || ':spanstart'), 1, 8))::BIGINT
                         % 20 = 0
                       THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                         CAST(pos AS VARCHAR) || ':spanlen'), 1, 8))::BIGINT
                         % 3 + 1
                       ELSE 0 END AS slen
                FROM tok),
         cov AS (SELECT doc_id, pos,
                   CASE WHEN max(CASE WHEN slen > 0 THEN pos + slen - 1
                                      ELSE -1 END)
                          OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                          >= pos
                        THEN 1 ELSE 0 END AS covered
                 FROM st),
         isl AS (SELECT doc_id, pos, covered,
                   CASE WHEN covered = 1 AND COALESCE(
                          lag(covered) OVER (PARTITION BY doc_id ORDER BY pos),
                          0) = 0
                        THEN 1 ELSE 0 END AS is_start
                 FROM cov)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(SUM(is_start) AS BIGINT) AS n_spans,
           CAST(SUM(covered) AS BIGINT) AS n_masked,
           CAST(count(*) - SUM(covered) + SUM(is_start) AS BIGINT) AS input_len,
           CAST(SUM(CASE WHEN covered = 1 THEN pos + 1 ELSE 0 END) AS BIGINT)
             AS cover_checksum
         FROM isl GROUP BY doc_id ORDER BY doc_id""",
    // Heaps replay: same first-occurrence aggregate + milestone fan-out.
    "q_llm_heaps" ->
      """WITH first AS (
           SELECT term, min(doc_id) AS first_doc FROM (
             SELECT DISTINCT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\s+')))
                 AS term
             FROM documents)
           GROUP BY term),
         ntok AS (SELECT doc_id,
                    len(string_split_regex(trim(text), '\s+')) AS ntok
                  FROM documents),
         ms(m) AS (VALUES (64), (256), (1024), (4096), (16384), (65536))
         SELECT CAST(ms.m AS BIGINT) AS milestone_doc,
           (SELECT CAST(COALESCE(sum(ntok), 0) AS BIGINT) FROM ntok
            WHERE doc_id < ms.m) AS corpus_tokens,
           (SELECT CAST(count(*) AS BIGINT) FROM first
            WHERE first_doc < ms.m) AS vocab
         FROM ms ORDER BY milestone_doc""",
    "q_llm_zipf" ->
      """WITH freq AS (
           SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
             SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents)
           GROUP BY term ORDER BY freq DESC, term LIMIT 50)
         SELECT CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
             AS rank,
           term, freq,
           CAST(row_number() OVER (ORDER BY freq DESC, term) * freq AS BIGINT)
             AS rank_freq
         FROM freq ORDER BY rank""",
    // RRF replay: the proven BM25 and brute-cosine formulations at k=20,
    // ranked, fused with the same 10⁹ // (60 + rank) integer units.
    "q_llm_search_hybrid" ->
      """WITH tk AS (SELECT doc_id,
                       unnest(string_split_regex(trim(text), '\s+')) AS term
                     FROM documents),
           dl AS (SELECT doc_id, count(*) AS dl FROM tk GROUP BY 1),
           qt AS (SELECT doc_id, term, count(*) AS tf FROM tk
                  WHERE term IN ('spark', 'join', 'window') GROUP BY 1, 2),
           df AS (SELECT term, count(*) AS df FROM qt GROUP BY 1),
           st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(dl) AS avgdl FROM dl),
           s AS (SELECT qt.doc_id,
                   CAST(floor(ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                         * (qt.tf * CAST(2.2 AS DOUBLE))
                         / (qt.tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl))
                         * 10000 + 0.5) AS BIGINT) AS c4
                 FROM qt JOIN dl USING (doc_id) JOIN df USING (term), st),
           bm AS (SELECT doc_id, CAST(SUM(c4) AS DOUBLE) / 10000.0 AS score
                  FROM s GROUP BY doc_id
                  ORDER BY score DESC, doc_id LIMIT 20),
           bmr AS (SELECT doc_id AS id,
                     1000000000 // (row_number() OVER
                       (ORDER BY score DESC, doc_id) + 60) AS c
                   FROM bm),
           q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
                 FROM embeddings WHERE vec_id = 0),
           cv AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                  FROM embeddings),
           annl AS (SELECT vec_id,
                      floor(list_sum(list_transform(list_zip(e, qe), p -> p[1] * p[2])) /
                        (sqrt(list_sum(list_transform(e, x -> x*x)))
                         * sqrt(list_sum(list_transform(qe, x -> x*x)))) * 1000000 + 0.5) / 1000000
                        AS cosine_sim
                    FROM cv, q ORDER BY cosine_sim DESC, vec_id LIMIT 20),
           annr AS (SELECT vec_id AS id,
                      1000000000 // (row_number() OVER
                        (ORDER BY cosine_sim DESC, vec_id) + 60) AS c
                    FROM annl)
         SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_lists,
           CAST(SUM(c) AS BIGINT) AS rrf_units
         FROM (SELECT * FROM bmr UNION ALL SELECT * FROM annr)
         GROUP BY id ORDER BY rrf_units DESC, doc_id LIMIT 10""",
    // Readability replay: same tokenization pairing, same regex counts,
    // same milli-unit truncating divisions (all operands positive).
    "q_llm_readability" ->
      """WITH d AS (SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\s+') END AS tk
           FROM documents WHERE doc_id % 31 = 0),
         m AS (SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS BIGINT) AS n_sentences,
             CAST(COALESCE(list_sum(list_transform(tk, w ->
               greatest(len(regexp_extract_all(lower(w), '[aeiouy]+')), 1))),
               0) AS BIGINT) AS n_syllables
           FROM d)
         SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(206835
             - (1015 * ((1000 * n_words) // n_sentences)) // 1000
             - (84600 * ((1000 * n_syllables) // n_words)) // 1000
             AS BIGINT) AS flesch_milli
         FROM m WHERE n_words > 0 ORDER BY doc_id""",
    // Watermark replay: same md5 head-nibble green list, same integer
    // numerator and single sqrt per doc.
    "q_llm_watermark" ->
      """WITH d AS (SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split_regex(trim(text), '\s+') END AS tk
           FROM documents),
         m AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(COALESCE(list_sum(list_transform(tk, w ->
               CASE WHEN substr(md5(w), 1, 1) IN
                 ('0','1','2','3','4','5','6','7') THEN 1 ELSE 0 END)), 0)
               AS BIGINT) AS n_green
           FROM d)
         SELECT doc_id, n_tokens, n_green,
           FLOOR(CAST(n_green * 2 - n_tokens AS DOUBLE)
             / sqrt(CAST(n_tokens AS DOUBLE)) * 1e4) / 1e4 AS z4
         FROM m WHERE n_tokens > 0
         ORDER BY abs(FLOOR(CAST(n_green * 2 - n_tokens AS DOUBLE)
           / sqrt(CAST(n_tokens AS DOUBLE)) * 1e4) / 1e4) DESC, doc_id
         LIMIT 20""",
    // Sentence-chunking replay: same regex splits, same packed-long
    // next-fit fold via list_reduce with list_prepend's init.
    // DEFLATE constants: precomputed once with the JDK zlib at the
    // kernel's exact parameters (level 6, raw, single pass) over the
    // fixed 10-doc corpus in llmCompressRatioDet; the engine recomputes
    // through DeflateLen, so a hash match pins the kernel. ratio4 is
    // replayed from each side's own deflate_bytes.
    "q_llm_compress_ratio_det" ->
      """SELECT CAST(doc AS BIGINT) AS doc,
           CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(deflate_bytes AS BIGINT) AS deflate_bytes,
           CAST(CASE WHEN n_bytes = 0 THEN NULL
                ELSE deflate_bytes * 10000 // n_bytes END AS BIGINT)
             AS ratio4
         FROM (VALUES (0, 0, 2), (1, 1, 3), (2, 43, 44), (3, 60, 6),
                      (4, 123, 92), (5, 79, 10), (6, 40, 15), (7, 44, 46),
                      (8, 224, 152), (9, 64, 30))
           AS t(doc, n_bytes, deflate_bytes)
         ORDER BY doc""",
    // Min-K% replay: the lm_score scored relation, per-doc value sort,
    // exact decimal k-smallest sum, same ceil(n/5).
    "q_llm_mink" ->
      """WITH tk AS (SELECT doc_id, string_split_regex(trim(text), '\s+')
             AS t FROM documents),
         g AS (SELECT doc_id,
                 CASE WHEN len(t) < 2 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t)),
                             i -> t[i] || ' ' || t[i+1]) END AS grams
               FROM tk),
         dg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
         big AS (SELECT gram, count(*) AS c2 FROM dg GROUP BY gram),
         unic AS (SELECT tok, count(*) AS c1
                  FROM (SELECT unnest(t) AS tok FROM tk) GROUP BY tok),
         v AS (SELECT count(*) AS vs FROM unic),
         terms AS (SELECT d.doc_id,
                     CAST(floor(ln((COALESCE(b.c2, 0) + 1.0)
                       / (COALESCE(u.c1, 0) + v.vs)) * 1e8 + 0.5) / 1e8
                       AS DECIMAL(28,8)) AS logp
                   FROM dg d
                   LEFT JOIN big b USING (gram)
                   LEFT JOIN unic u ON string_split(d.gram, ' ')[1] = u.tok
                   CROSS JOIN v),
         per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST((count(*) + 4) // 5 AS BIGINT) AS k_lowest,
                   list_sort(list(logp)) AS lp
                 FROM terms GROUP BY doc_id)
         SELECT doc_id, n_bigrams, k_lowest,
           floor(CAST(list_reduce(
               list_prepend(CAST(0 AS DECIMAL(28,8)),
                 lp[1:CAST(k_lowest AS INT)]),
               (a, x) -> CAST(a + x AS DECIMAL(28,8))) AS DOUBLE)
             / k_lowest * 1e6 + 0.5) / 1e6 AS mink_logp
         FROM per ORDER BY mink_logp, doc_id LIMIT 20""",
    // JSD replay: same integer token counts, same per-term
    // floor-to-1e-8 of ln on identical doubles, same surface division.
    "q_llm_jsd" ->
      """WITH toks AS (SELECT
             CAST(substr(source, 4, 8) AS INT) % 2 = 0 AS even,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM documents),
         counts AS (SELECT tok,
             CAST(sum(CASE WHEN even THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN even THEN 0 ELSE 1 END) AS BIGINT) AS b
           FROM toks GROUP BY tok),
         tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
                   CAST(sum(b) AS BIGINT) AS tb FROM counts),
         terms AS (SELECT
             CASE WHEN a > 0 THEN CAST(a AS HUGEINT) * CAST(FLOOR(
               ln((2.0 * a * tb) / (CAST(a AS DOUBLE) * tb
                 + CAST(b AS DOUBLE) * ta)) * 1e8) AS HUGEINT)
               ELSE 0 END AS la,
             CASE WHEN b > 0 THEN CAST(b AS HUGEINT) * CAST(FLOOR(
               ln((2.0 * b * ta) / (CAST(a AS DOUBLE) * tb
                 + CAST(b AS DOUBLE) * ta)) * 1e8) AS HUGEINT)
               ELSE 0 END AS lb,
             ta, tb
           FROM counts, tot)
         SELECT CAST(count(*) AS BIGINT) AS n_vocab,
           ta AS tokens_even, tb AS tokens_odd,
           FLOOR((CAST(sum(la) AS DOUBLE) / ta
             + CAST(sum(lb) AS DOUBLE) / tb) / 2.0 / 1e8 * 1e6) / 1e6
             AS jsd6
         FROM terms GROUP BY ta, tb""",
    // Langid-eval replay: the q_llm_langid detector with the actual
    // label carried through.
    "q_llm_langid_eval" ->
      """WITH hits AS (SELECT lang AS actual_lang,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('the','a','of','and','to','in','is','that','it','for'))) AS en,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('der','die','das','und','ist','von','zu','mit','auf','ein'))) AS de,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('le','la','les','de','et','est','un','une','que','pour'))) AS fr,
           len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
             t -> t IN ('el','la','los','de','y','es','un','una','que','por'))) AS es
           FROM documents),
         det AS (SELECT actual_lang, CASE
             WHEN greatest(en, de, fr, es) = 0 THEN 'und'
             WHEN en = greatest(en, de, fr, es) THEN 'en'
             WHEN de = greatest(en, de, fr, es) THEN 'de'
             WHEN fr = greatest(en, de, fr, es) THEN 'fr'
             ELSE 'es' END AS detected_lang FROM hits)
         SELECT actual_lang, detected_lang, CAST(count(*) AS BIGINT) AS n,
           actual_lang = detected_lang AS is_match
         FROM det GROUP BY 1, 2 ORDER BY actual_lang, detected_lang""",
    // Self-BLEU replay: same md5-ranked 20-doc panel, same clipped
    // max-count matches, same packed-argmin BP length, same fixed-order
    // exp/ln surface.
    "q_llm_self_bleu" ->
      """WITH base0 AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         docs AS (SELECT doc_id, t FROM base0 WHERE len(t) >= 2),
         refs AS (SELECT doc_id AS ref_id, t FROM (
             SELECT doc_id, t, row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
             FROM docs) WHERE rk <= 20),
         reflens AS (SELECT ref_id, CAST(len(t) AS BIGINT) AS r FROM refs),
         refuni AS (SELECT tok, CAST(max(c) AS BIGINT) AS rmax FROM (
             SELECT ref_id, tok, count(*) AS c FROM (
               SELECT ref_id, unnest(t) AS tok FROM refs)
             GROUP BY ref_id, tok) GROUP BY tok),
         refbi AS (SELECT gram, CAST(max(c) AS BIGINT) AS rmax FROM (
             SELECT ref_id, gram, count(*) AS c FROM (
               SELECT ref_id, unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1])) AS gram FROM refs)
             GROUP BY ref_id, gram) GROUP BY gram),
         cand AS (SELECT doc_id, t FROM docs
                  WHERE doc_id NOT IN (SELECT ref_id FROM refs)),
         base AS (SELECT doc_id, c1, c1 - 1 AS c2,
             rkey % 1000000000 AS r FROM (
             SELECT d.doc_id, CAST(len(d.t) AS BIGINT) AS c1,
               CAST(min(abs(l.r - len(d.t)) * 1000000000 + l.r)
                 AS BIGINT) AS rkey
             FROM cand d, reflens l GROUP BY 1, 2)),
         mm1 AS (SELECT doc_id, CAST(sum(LEAST(cnt, rmax)) AS BIGINT)
               AS m1 FROM (
             SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT doc_id, unnest(t) AS tok FROM cand)
             GROUP BY doc_id, tok) c
           JOIN refuni USING (tok) GROUP BY doc_id),
         mm2 AS (SELECT doc_id, CAST(sum(LEAST(cnt, rmax)) AS BIGINT)
               AS m2 FROM (
             SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM (
               SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> t[i] || ' ' || t[i+1])) AS gram FROM cand)
             GROUP BY doc_id, gram) c
           JOIN refbi USING (gram) GROUP BY doc_id)
         SELECT b.doc_id, b.c1, b.r,
           CAST(COALESCE(mm1.m1, 0) AS BIGINT) AS m1,
           CAST(COALESCE(mm2.m2, 0) AS BIGINT) AS m2,
           CASE WHEN COALESCE(mm1.m1, 0) = 0 OR COALESCE(mm2.m2, 0) = 0
             THEN CAST(0 AS BIGINT)
             ELSE CAST(FLOOR(exp(
               (CASE WHEN b.c1 >= b.r THEN 0.0
                ELSE 1.0 - CAST(b.r AS DOUBLE) / CAST(b.c1 AS DOUBLE) END)
               + 0.5 * ln(CAST(mm1.m1 AS DOUBLE) / CAST(b.c1 AS DOUBLE))
               + 0.5 * ln(CAST(mm2.m2 AS DOUBLE) / CAST(b.c2 AS DOUBLE)))
               * 1e4) AS BIGINT) END AS bleu4
         FROM base b LEFT JOIN mm1 USING (doc_id)
           LEFT JOIN mm2 USING (doc_id)
         ORDER BY b.doc_id""",
    // McNemar replay: the gopher-gate CTE (q_llm_gopher's) and the
    // quality CTE (q_llm_quality's, as reused by cluster_best) joined
    // per doc, same exact 2×2 cells, same continuity-corrected micro χ².
    "q_llm_mcnemar" ->
      (gopherQualityCtes + """,
         j AS (SELECT gp.gp AS gp, qq.quality >= 0.5 AS qp
               FROM gp JOIN qq USING (doc_id)),
         a AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN gp AND qp THEN 1 ELSE 0 END) AS BIGINT)
               AS both_pass,
             CAST(sum(CASE WHEN gp AND NOT qp THEN 1 ELSE 0 END) AS BIGINT)
               AS gopher_only,
             CAST(sum(CASE WHEN NOT gp AND qp THEN 1 ELSE 0 END) AS BIGINT)
               AS quality_only,
             CAST(sum(CASE WHEN NOT gp AND NOT qp THEN 1 ELSE 0 END)
               AS BIGINT) AS neither
           FROM j)
         SELECT n, both_pass, gopher_only, quality_only, neither,
           CAST((both_pass + neither) * 1000000 // n AS BIGINT)
             AS agree_micro,
           CAST(CASE WHEN gopher_only + quality_only = 0 THEN 0 ELSE
             greatest(abs(gopher_only - quality_only) - 1, 0)
             * greatest(abs(gopher_only - quality_only) - 1, 0)
             * 1000000 // (gopher_only + quality_only) END AS BIGINT)
             AS mcnemar_micro
         FROM a"""),
    // Dunning G2 replay: positions table self-joined at distance exactly 1
    // (independent derivation of the adjacent-bigram counts vs the
    // engine's shifted zip), positional left/right marginals, then the
    // four 0*ln0-guarded cells summed in the engine's term order.
    "q_llm_collocations" ->
      """WITH tokl AS (SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\s+') END AS ts
             FROM documents),
         tok AS (SELECT doc_id, i, ts[CAST(i + 1 AS INT)] AS tok
                 FROM tokl, unnest(range(len(ts))) u(i)),
         pr AS (SELECT a.tok AS tok_a, b.tok AS tok_b
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                  AND b.i - a.i = 1),
         pc AS (SELECT tok_a, tok_b, CAST(count(*) AS BIGINT) AS n_pair
                FROM pr GROUP BY tok_a, tok_b HAVING count(*) >= 5),
         lm AS (SELECT tok_a, CAST(count(*) AS BIGINT) AS n_a
                FROM pr GROUP BY tok_a),
         rm AS (SELECT tok_b, CAST(count(*) AS BIGINT) AS n_b
                FROM pr GROUP BY tok_b),
         tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM pr),
         cells AS (SELECT tok_a, tok_b, n_pair, n_a, n_b, n_total,
             n_pair AS k11, n_a - n_pair AS k12, n_b - n_pair AS k21,
             n_total - n_a - n_b + n_pair AS k22,
             n_total - n_a AS r2, n_total - n_b AS c2
           FROM pc JOIN lm USING (tok_a) JOIN rm USING (tok_b), tot)
         SELECT tok_a, tok_b, n_pair, n_a, n_b,
           floor((
             (CASE WHEN k11 = 0 THEN 0.0 ELSE CAST(k11 AS DOUBLE)
               * ln(CAST(k11 AS DOUBLE) * CAST(n_total AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) END)
             + (CASE WHEN k12 = 0 THEN 0.0 ELSE CAST(k12 AS DOUBLE)
               * ln(CAST(k12 AS DOUBLE) * CAST(n_total AS DOUBLE)
                 / (CAST(n_a AS DOUBLE) * CAST(c2 AS DOUBLE))) END)
             + (CASE WHEN k21 = 0 THEN 0.0 ELSE CAST(k21 AS DOUBLE)
               * ln(CAST(k21 AS DOUBLE) * CAST(n_total AS DOUBLE)
                 / (CAST(r2 AS DOUBLE) * CAST(n_b AS DOUBLE))) END)
             + (CASE WHEN k22 = 0 THEN 0.0 ELSE CAST(k22 AS DOUBLE)
               * ln(CAST(k22 AS DOUBLE) * CAST(n_total AS DOUBLE)
                 / (CAST(r2 AS DOUBLE) * CAST(c2 AS DOUBLE))) END))
             * 2 * 10000 + CAST(0.5 AS DOUBLE)) / 10000 AS g2
         FROM cells ORDER BY tok_a, tok_b""",
    // Lexical-diversity replay: same tokenizer, same (doc, token) counts,
    // left join keeps empty docs as zero rows, micro divisions + the one
    // V/sqrt(N) double surface floored 4dp.
    "q_llm_lexdiv" ->
      """WITH tok AS (SELECT doc_id,
             unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE string_split_regex(trim(text), '\s+') END) AS tok
           FROM documents),
         tc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
                FROM tok GROUP BY doc_id, tok),
         agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
           FROM tc GROUP BY doc_id),
         tot AS (SELECT d.doc_id,
             COALESCE(n_tokens, 0) AS n_tokens,
             COALESCE(n_types, 0) AS n_types,
             COALESCE(n_hapax, 0) AS n_hapax
           FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id)
         SELECT doc_id, n_tokens, n_types, n_hapax,
           CAST(CASE WHEN n_tokens = 0 THEN 0
             ELSE n_types * 1000000 // n_tokens END AS BIGINT) AS ttr_micro,
           CASE WHEN n_tokens = 0 THEN CAST(0.0 AS DOUBLE)
             ELSE floor(CAST(n_types AS DOUBLE)
               / sqrt(CAST(n_tokens AS DOUBLE)) * 10000) / 10000 END
             AS guiraud4,
           CAST(CASE WHEN n_tokens = 0 THEN 0
             ELSE n_hapax * 1000000 // n_tokens END AS BIGINT) AS hapax_micro
         FROM tot ORDER BY doc_id""",
    // ROUGE-2 replay: the self-BLEU panel CTEs, per-(cand, ref) clipped
    // bigram overlaps, the full 20-wide grid with zero-overlap rows, and
    // the same truncated-f1/min-ref_id best pick.
    "q_llm_rouge2" ->
      """WITH base0 AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS t FROM documents),
         docs AS (SELECT doc_id, t FROM base0 WHERE len(t) >= 2),
         refs AS (SELECT doc_id AS ref_id, t FROM (
             SELECT doc_id, t, row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rk
             FROM docs) WHERE rk <= 20),
         refbi AS (SELECT ref_id, gram, CAST(count(*) AS BIGINT) AS rc
           FROM (SELECT ref_id, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i+1])) AS gram FROM refs)
           GROUP BY ref_id, gram),
         reftot AS (SELECT ref_id, CAST(sum(rc) AS BIGINT) AS nr
           FROM refbi GROUP BY ref_id),
         cand AS (SELECT doc_id, t FROM docs
                  WHERE doc_id NOT IN (SELECT ref_id FROM refs)),
         candbi AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt
           FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i+1])) AS gram FROM cand)
           GROUP BY doc_id, gram),
         candtot AS (SELECT doc_id, CAST(len(t) - 1 AS BIGINT) AS nd
           FROM cand),
         ov AS (SELECT doc_id, ref_id,
             CAST(sum(LEAST(cnt, rc)) AS BIGINT) AS o
           FROM candbi JOIN refbi USING (gram)
           GROUP BY doc_id, ref_id),
         ovf AS (SELECT ov.doc_id, ov.ref_id, ov.o, r.nr, c.nd,
             2 * ov.o * 1000000 // (c.nd + r.nr) AS f1_micro
           FROM ov JOIN reftot r USING (ref_id)
             JOIN candtot c USING (doc_id)),
         best AS (SELECT doc_id, ref_id, o, nr, f1_micro FROM (
             SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY f1_micro DESC, ref_id) AS rn FROM ovf)
           WHERE rn = 1),
         fb AS (SELECT ref_id, nr FROM reftot ORDER BY ref_id LIMIT 1)
         SELECT c.doc_id,
           COALESCE(b.ref_id, fb.ref_id) AS best_ref,
           COALESCE(b.o, 0) AS overlap, c.nd,
           COALESCE(b.nr, fb.nr) AS nr,
           CAST(COALESCE(b.o, 0) * 1000000 // COALESCE(b.nr, fb.nr)
             AS BIGINT) AS recall_micro,
           CAST(COALESCE(b.o, 0) * 1000000 // c.nd AS BIGINT)
             AS precision_micro,
           CAST(COALESCE(b.f1_micro, 0) AS BIGINT) AS f1_micro
         FROM candtot c LEFT JOIN best b USING (doc_id), fb
         ORDER BY doc_id""",
  )
}
