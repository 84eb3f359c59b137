package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: language
  * ID, quality scoring, token counting, fingerprinting. All pure Column
  * expressions — codegen-friendly, no UDFs, scale-invariant (per-row map
  * work, zero shuffles until the caller aggregates). */
object TextAnalysis {

  /** Whitespace tokenization. Empty/whitespace-only text → empty array. */
  def tokens(text: Column): Column =
    when(trim(text) === "", array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: alpha runs, digit runs, and single punctuation
    * marks each count as one token — the standard cheap estimator when the
    * real tokenizer isn't on the cluster. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Language-ID heuristic: per-language stopword hit counts over whitespace
    * tokens; argmax wins, ties broken by fixed language order. N-gram-free
    * so it stays expressible as pure Column ops (and in the DuckDB oracle). */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "zu", "mit", "auf", "ein"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"),
    "es" -> Seq("el", "la", "los", "de", "y", "es", "un", "una", "que", "por"),
  )

  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(lower(text)), t => words.map(w => t === w).reduce(_ || _)))

  /** Relation-level language ID: explode tokens once and compute all
    * per-language hit counts as codegen'd conditional sums — same result as
    * [[langId]], but the higher-order-function filters (interpreted
    * per-token) are replaced by one shuffle on the doc id. Use for corpus
    * scoring; use [[langId]] for ad-hoc row expressions. */
  def langIds(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val exploded = df
      .select(col(idCol), explode_outer(tokens(lower(col(textCol)))).as("_t"))
    val aggs = StopwordSets.map { case (lang, words) =>
      sum(when(col("_t").isin(words: _*), 1).otherwise(0)).as(s"_hits_$lang")
    }
    val counts = exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val best = StopwordSets.map(s => col(s"_hits_${s._1}")).reduce((a, b) => greatest(a, b))
    val detected = StopwordSets.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"_hits_$lang") === best && best > 0, lit(lang)).otherwise(acc)
    }
    counts.select(col(idCol), detected.as("detected_lang"))
  }

  /** Detected language code, or "und" when no stopword hits at all. Ties
    * break to the FIRST language in [[StopwordSets]] order. */
  def langId(text: Column): Column = {
    val counts = StopwordSets.map { case (lang, words) =>
      lang -> stopwordHits(text, words)
    }
    val best = counts.map(_._2).reduce((a, b) => greatest(a, b))
    counts.reverse.foldLeft(lit("und")) { case (acc, (lang, c)) =>
      when(c === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality score in [0,1]: blend of length band, alpha ratio, stopword
    * ratio, and mean word length band — the usual cheap pre-filters before
    * expensive model-based scoring. Deterministic, oracle-expressible. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val alphaRatio = when(nChars > 0, alpha / nChars).otherwise(lit(0.0))
    val sw = StopwordSets.flatMap(_._2).distinct
    val swHits = size(filter(tokens(lower(text)), t => sw.map(w => t === w).reduce(_ || _))).cast("double")
    val swRatio = when(nTokens > 0, swHits / nTokens).otherwise(lit(0.0))
    val meanWordLen = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val lenScore = when(nChars >= 200 && nChars <= 2000, 1.0)
      .when(nChars >= 50, 0.5).otherwise(0.0)
    val wordLenScore = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0).otherwise(0.0)
    // floor(x*10^4+0.5)/10^4: engine-agnostic half-up (see Similarity.roundHalfUp)
    floor((lenScore * 0.3 + alphaRatio * 0.3 + least(swRatio * lit(5.0), lit(1.0)) * 0.2
      + wordLenScore * 0.2) * 10000.0 + 0.5) / 10000.0
  }

  // ---- Gopher-style document-format rules (public heuristics from "Scaling
  // Language Models: Methods, Analysis & Insights from Training Gopher",
  // Rae et al. 2021, App. A — the standard cheap pre-filters a training-data
  // pipeline runs before any model-based scoring). All pure Column
  // expressions; ratios rounded half-up to 4 dp in engine-agnostic floor
  // form so the DuckDB oracle hash-matches.

  private def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0
  private def docLines(text: Column): Column = split(text, "\n")

  /** Mean word length: non-whitespace chars / word count. */
  def meanWordLen(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val chars = length(regexp_replace(text, "\\s+", "")).cast("double")
    when(n > 0, r4(chars / n)).otherwise(lit(0.0))
  }

  /** Symbol-to-word ratio: ('#' occurrences + '...' occurrences) / words. */
  def symbolWordRatio(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val hashes = (length(text) - length(regexp_replace(text, "#", ""))).cast("double")
    val ellipses = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0))).cast("double")
    when(n > 0, r4((hashes + ellipses) / n)).otherwise(lit(0.0))
  }

  /** Fraction of lines starting with a bullet ('-' or '*'). */
  def bulletLineFrac(text: Column): Column = {
    val ls = docLines(text)
    val b = size(filter(ls, l => trim(l).rlike("^[-*]"))).cast("double")
    r4(b / size(ls).cast("double")) // split() yields >= 1 line always
  }

  /** Fraction of lines ending with an ellipsis. */
  def ellipsisLineFrac(text: Column): Column = {
    val ls = docLines(text)
    val e = size(filter(ls, l => trim(l).endsWith("..."))).cast("double")
    r4(e / size(ls).cast("double"))
  }

  /** Fraction of words containing at least one alphabetic character. */
  def alphaWordFrac(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val a = size(filter(tokens(text), t => t.rlike("[A-Za-z]"))).cast("double")
    when(n > 0, r4(a / n)).otherwise(lit(0.0))
  }

  /** The conjunction of the Gopher format rules: 50–100k words, mean word
    * length 3–10, symbol ratio < 0.1, bullet lines < 90%, ellipsis lines
    * < 30%, alpha-word fraction > 0.8, ≥ 2 English stopwords. Comparisons
    * run on the same rounded values the per-rule columns surface. */
  def gopherPass(text: Column): Column = {
    val n = tokenCount(text)
    val stops = stopwordHits(text, StopwordSets.head._2)
    n.between(50, 100000) &&
      meanWordLen(text).between(3.0, 10.0) &&
      symbolWordRatio(text) < 0.1 &&
      bulletLineFrac(text) < 0.9 &&
      ellipsisLineFrac(text) < 0.3 &&
      alphaWordFrac(text) > 0.8 &&
      stops >= 2
  }

  /** Gopher repetition rule: fraction of lines that are duplicates of an
    * earlier line. Boilerplate-heavy pages (nav bars, cookie banners) score
    * high and get filtered before training. */
  def dupLineFrac(text: Column): Column = {
    val ls = docLines(text)
    r4((size(ls) - size(array_distinct(ls))).cast("double") / size(ls).cast("double"))
  }

  /** Companion repetition rule: fraction of CHARACTERS sitting in duplicate
    * lines (a page whose one repeated line is huge should score worse than
    * one repeating a short divider). */
  def dupLineCharFrac(text: Column): Column = {
    val ls = docLines(text)
    val total = aggregate(ls, lit(0), (a, l) => a + length(l)).cast("double")
    val distinctChars = aggregate(array_distinct(ls), lit(0), (a, l) => a + length(l)).cast("double")
    when(total > 0, r4((total - distinctChars) / total)).otherwise(lit(0.0))
  }

  // ---- PII scrubbing: the standard pre-training redaction pass. Patterns
  // deliberately use only syntax with identical semantics in Java regex
  // (Spark codegen) and RE2 (DuckDB oracle): char classes, greedy
  // quantifiers, \b — no alternation, no backrefs.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\b\\d{3}[- .]\\d{3}[- .]\\d{4}\\b"

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then URLs, then phone-number shapes (order matters and
    * is part of the contract — an email inside a URL is already gone when
    * the URL pass runs). */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "<EMAIL>"), UrlRe, "<URL>"), PhoneRe, "<PHONE>")

  /** Canonical-form fingerprint: md5 of lowercased, punctuation-stripped,
    * whitespace-collapsed text. Stable across formatting-only edits. */
  def fingerprint(text: Column): Column = {
    val norm = trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))
    md5(norm)
  }

  /** Rolling polynomial hash (base 31, mod 2^61-1) over whitespace tokens —
    * the order-sensitive fingerprint variant (detects reordering, which the
    * bag-of-words md5 above does not). Backed by the native codegen'd
    * [[graft.expressions.RollingHash64]] Expression; the prior
    * `aggregate(...)` lambda formulation computed the identical fold but
    * interpreted it per element outside whole-stage codegen. */
  def rollingHash(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.RollingHash64(
      Bridge.expression(tokens(text))))
  }

  /** EVERY sliding word n-gram in order (multiplicity preserved) — the
    * counting variant of [[Dedup.shingles]], backed by the same native
    * codegen'd kernel. Fewer than n tokens → one gram of all tokens. */
  def wordGrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.WordNGrams(
      Bridge.expression(tokens(text)), n, keepDuplicates = true))
  }

  /** Corpus-wide top-k vocabulary: token (or n-gram) frequencies with a
    * deterministic tie-break — the counting pass a BPE/vocab builder runs
    * first. Partial-aggregates map-side, shuffles once on the gram, and
    * top-k's via TakeOrderedAndProject (no global sort materialized). */
  def topVocabulary(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(wordGrams(col(textCol), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram").asc)
      .limit(k)

  /** Engine-portable rolling hash: same codegen'd fold with md5-prefix
    * token hashes and a 2^31-1 modulus, reproducible in DuckDB via
    * `list_reduce` (see [[graft.expressions.HashHelpers.md5Prefix7]]) —
    * the oracle-checkable variant of [[rollingHash]]. */
  def rollingHashPortable(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.RollingHash64(
      Bridge.expression(tokens(text)), portable = true))
  }

  /** Boilerplate-line removal: drop lines matching the classic web-chrome
    * patterns (copyright/cookie/subscribe/nav phrases). Line-local and
    * embarrassingly parallel; the filter lambda runs over a SHORT
    * per-document line list, not a corpus-sized relation. The pattern set
    * is deliberately small and literal — mirrored verbatim in the DuckDB
    * oracle (Java regex and RE2 agree on plain alternations). */
  val boilerplatePattern: String =
    "(all rights reserved|cookie|subscribe|sign up|click here|" +
      "terms of service|privacy policy|copyright|©)"

  def stripBoilerplate(text: Column): Column =
    array_join(
      filter(docLines(text), l => !lower(l).rlike(boilerplatePattern)),
      "\n")

  /** Character coverage of the heaviest word n-gram (count × gram chars),
    * via the native row-local [[graft.expressions.TopNGramChars]] — zero
    * shuffle; see that file for why the relational explode/groupBy
    * formulation is wrong at scale. */
  def topNGramChars(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.TopNGramChars(
      Bridge.expression(tokens(text)), n))
  }

  /** Unicode normalization (native [[graft.expressions.UnicodeNormalize]];
    * zero-copy ASCII fast path). Normalize BEFORE any byte-hashing dedup —
    * composed vs decomposed input otherwise defeats exact/MinHash/
    * fingerprint matching. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.UnicodeNormalize(
      Bridge.expression(text), form))
  }

  /** DEFLATE-compressed length of the text's UTF-8 bytes (native
    * [[graft.expressions.DeflateLen]]). */
  def deflateLen(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.DeflateLen(Bridge.expression(text)))
  }

  /** Compression-ratio quality signal: deflate bytes / raw bytes, rounded
    * half-up to 4 dp. Template/machine-generated text compresses far
    * better than natural prose — the Dolma/RedPajama pipelines gate on
    * exactly this ratio (low = repetitive, suspiciously high = already
    * compressed or random). Empty text → ratio 0. */
  def compressionRatio(text: Column): Column = {
    val raw = octet_length(text).cast("double")
    when(raw > 0, r4(deflateLen(text).cast("double") / raw)).otherwise(lit(0.0))
  }

  // ---- HTML → text extraction: the FIRST step of every web-corpus
  // pipeline (CommonCrawl WARC → visible text). Row-local and shuffle-free;
  // every pattern uses only syntax with identical semantics in Java regex
  // (Spark codegen) and RE2 (the DuckDB oracle): `(?is)` flags, non-greedy
  // `.*?`, char classes — no backrefs, no lookaround.

  /** Visible text from an HTML document:
    * 0. normalize CRLF/CR line endings to `\n` (CommonCrawl input is
    *    routinely CRLF; without this, stray `\r` pollutes the line
    *    structure every downstream filter depends on);
    * 1. drop `<script>`/`<style>` subtrees (their text is never visible);
    * 2. turn block-level tags (including table cells) into newlines so
    *    paragraph/cell structure survives for the downstream line-based
    *    filters (boilerplate removal, Gopher bullet/ellipsis rules) and
    *    adjacent cell text never concatenates into merged words;
    * 3. strip every remaining tag;
    * 4. decode the entities that appear in practice (`&amp;` LAST, so
    *    `&amp;lt;` decodes to the literal `&lt;` the author wrote, not
    *    to `<`);
    * 5. collapse whitespace: newline runs → one `\n`, space/tab runs →
    *    one space, trim the ends.
    *
    * Tag names are anchored by `(>|[\s/][^>]*>)` so `<pre>`/`<param>`/
    * `<link>` don't match the `p`/`li` branches. Case-insensitivity is
    * spelled `(?iu)` here but `(?i)` in the DuckDB oracle: Java's bare
    * `(?i)` folds ASCII only, while RE2's `(?i)` always does Unicode
    * simple folding — adding `u` (a Java-only flag; RE2 rejects it) makes
    * Java fold `ſ`→`s`/`K`→`k` the same way RE2 does. */
  def htmlToText(html: Column): Column = {
    val unixNl = regexp_replace(html, "\\r\\n?", "\n")
    val noScript = regexp_replace(unixNl,
      "(?ius)<script(>|[\\s/][^>]*>).*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?ius)<style(>|[\\s/][^>]*>).*?</style>", "")
    val blocks = regexp_replace(noStyle,
      "(?iu)</?(p|div|br|li|ul|ol|tr|td|th|table|h1|h2|h3|h4|h5|h6)(>|[\\s/][^>]*>)",
      "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&",
    ).foldLeft(noTags) { case (c, (ent, ch)) =>
      regexp_replace(c, ent, ch)
    }
    val oneNl = regexp_replace(decoded, "[ \\t]*\\n[ \\t\\n]*", "\n")
    val oneSp = regexp_replace(oneNl, "[ \\t]+", " ")
    trim(oneSp, " \n")
  }
}
