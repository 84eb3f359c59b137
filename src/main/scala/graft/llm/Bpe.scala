package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"): learn a merge table
  * from corpus statistics, then greedily apply merges to tokenize.
  *
  * Scale split — the part that is data-sized runs distributed, the part
  * that is vocabulary-sized runs bounded on the driver:
  *   - word counting is a full-corpus explode + groupBy (one shuffle,
  *     output bounded by distinct-word count);
  *   - merge learning operates on the top-`maxWords` (frequency, then
  *     lexicographic) word-frequency table — a bounded collect, the same
  *     contract as Lloyd's centroid reads in [[Ivf]]/[[Pq]]. Truncating
  *     the long tail of the word distribution is how the published BPE
  *     trainers scale too: pair statistics are dominated by frequent
  *     words, and rare-word mass changes merges only marginally;
  *   - encoding broadcasts the merge ranks inside a native expression
  *     ([[graft.expressions.BpeEncode]]) — per-row work on the scan side,
  *     no shuffle, inside whole-stage codegen.
  *
  * Determinism: pair selection is (count desc, pair lexicographic asc);
  * word truncation is (freq desc, word asc); merge application merges all
  * occurrences of the chosen pair left-to-right. Training twice on the
  * same corpus yields identical merge tables, and encode is a pure
  * function of (text, merges).
  */
object Bpe {

  /** Ordered merge table: `pairs(i)` = the pair merged at rank i. */
  final case class Merges(pairs: IndexedSeq[(String, String)]) {
    def ranks: Map[(String, String), Int] = pairs.zipWithIndex.toMap
    def size: Int = pairs.size
  }

  /** Learn `numMerges` merges from the corpus' word-frequency table. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 65536): Merges = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val wordFreq = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordFreq(wordFreq.toIndexedSeq, numMerges)
  }

  /** Driver-side merge learning over a bounded word table (exposed for
    * specs; [[train]] supplies the distributed counts). Pair counts are
    * per adjacent symbol position (overlapping, the Sennrich convention:
    * "aaa" contributes two "a a" pairs). */
  def trainFromWordFreq(wordFreq: IndexedSeq[(String, Long)],
                        numMerges: Int): Merges = {
    // Each word as a mutable symbol buffer (code points, matching the
    // encoder — a char-level split would disagree on supplementary
    // characters); freqs parallel array.
    val words = wordFreq.map { case (w, _) =>
      val buf = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        buf += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      buf
    }
    val freqs = wordFreq.map(_._2)
    val merges = IndexedSeq.newBuilder[(String, String)]
    var m = 0
    var exhausted = false
    while (m < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val w = words(wi)
        val f = freqs(wi)
        var i = 0
        while (i < w.length - 1) {
          val p = (w(i), w(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        // Deterministic best: max count, ties -> lexicographically least.
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words.foreach { w =>
          var i = 0
          while (i < w.length - 1) {
            if (w(i) == best._1 && w(i + 1) == best._2) {
              w(i) = joined
              w.remove(i + 1)
            } else i += 1
          }
        }
        m += 1
      }
    }
    Merges(merges.result())
  }

  /** Serializable encode kernel: greedy lowest-rank merging per word.
    * Pure (no per-instance mutable state), so it is safe as a shared
    * codegen reference object across local-mode task threads. */
  final class Encoder(val rankPairs: Array[String]) extends Serializable {
    // rankPairs is the flat (left, right) pair list in rank order — plain
    // arrays serialize compactly into the task binary. Key separator is
    // U+0001, which cannot occur inside a symbol (symbols come from
    // whitespace-split tokens' characters and their concatenations).
    private val Sep = '\u0001'
    @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
      val h = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < rankPairs.length / 2) {
        h.put(rankPairs(2 * i) + Sep + rankPairs(2 * i + 1), i)
        i += 1
      }
      h
    }

    /** BPE-tokenize one word: start from characters; repeatedly find the
      * lowest-rank pair present and merge ALL its occurrences left-to-
      * right, then rescan — the canonical apply loop, and the same
      * all-occurrences semantics the trainer uses, so encoding a training
      * word reproduces its training-time segmentation. */
    def encodeWord(word: String): Array[String] = {
      if (word.isEmpty) return Array.empty
      val syms = new java.util.ArrayList[String](word.length)
      // Iterate by CODE POINT, not UTF-16 unit: charAt would split a
      // supplementary character (emoji etc.) into two unpaired surrogates
      // that round-trip as '?' bytes — breaking losslessness.
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        syms.add(new String(Character.toChars(cp)))
        i += Character.charCount(cp)
      }
      var done = false
      while (!done && syms.size > 1) {
        var bestRank = Int.MaxValue
        var bestLeft: String = null
        var bestRight: String = null
        var j = 0
        while (j < syms.size - 1) {
          val r = ranks.get(syms.get(j) + Sep + syms.get(j + 1))
          if (r != null && r < bestRank) {
            bestRank = r; bestLeft = syms.get(j); bestRight = syms.get(j + 1)
          }
          j += 1
        }
        if (bestLeft == null) done = true
        else {
          val joined = bestLeft + bestRight
          var k = 0
          while (k < syms.size - 1) {
            if (syms.get(k) == bestLeft && syms.get(k + 1) == bestRight) {
              syms.set(k, joined)
              syms.remove(k + 1)
            } else k += 1
          }
        }
      }
      val out = new Array[String](syms.size)
      syms.toArray(out)
      out
    }

    /** Tokenize a whitespace-separated document; word boundaries are
      * never merged across ([[TextAnalysis.tokens]] split semantics). */
    def encodeDoc(text: String): Array[String] = {
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      val out = mutable.ArrayBuffer.empty[String]
      words.foreach(w => out ++= encodeWord(w))
      out.toArray
    }
  }

  def encoder(merges: Merges): Encoder =
    new Encoder(merges.pairs.flatMap(p => Seq(p._1, p._2)).toArray)

  /** Persist a trained merge table as (rank, left, right) parquet — the
    * train-once artifact a pipeline ships so every later ingest run (or
    * another cluster) tokenizes identically without re-counting the
    * corpus. Rank order is the whole contract; [[loadMerges]] restores it
    * explicitly rather than trusting file order. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession, merges: Merges,
                 path: String): Unit = {
    import spark.implicits._
    merges.pairs.zipWithIndex
      .map { case ((l, r), i) => (i, l, r) }
      .toDF("rank", "left", "right")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: org.apache.spark.sql.SparkSession,
                 path: String): Merges = {
    val rows = spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
    Merges(rows.map(r => (r.getString(1), r.getString(2))).toIndexedSeq)
  }

  /** Column API: BPE token array for a string column via the native
    * codegen'd expression. */
  def encode(text: Column, merges: Merges): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.expressions.BpeEncode(
      Bridge.expression(text), encoder(merges)))
  }

  /** GENERATED DuckDB replay of [[trainFromWordFreq]] — the whole merge
    * learning loop as SQL, keeping both engines in lockstep by
    * construction (the DetKMeans/PageRank/KCore pattern, applied to the
    * one trained artifact left without an oracle).
    *
    * Per round: pair counts from the chr(1)-separated word states
    * (overlapping adjacent positions, freq-weighted), the argmax with
    * the trainer's exact tie-break (count desc, then pair lexicographic —
    * a radix argument makes ORDER BY a, b equal to tuple order), then
    * merge application as a RECURSIVE CTE replacing the LEFTMOST
    * occurrence one step at a time until none remains. Single-leftmost
    * iteration — not SQL replace() — is load-bearing: replace() consumes
    * the shared boundary separator between adjacent matches, which on
    * odd runs ("aaa" merging (a,a)) leaves a RIGHT-aligned leftover where
    * the trainer leaves it left-aligned, and later rounds diverge.
    * A merged symbol can never re-form the pair being merged (that would
    * need a == a+b), so leftmost-stepping is confluent with the trainer's
    * scan. All non-recursive CTEs are MATERIALIZED (the KCore lesson:
    * DuckDB inlines plain CTEs and each round references its parent
    * several times — the expansion is exponential in rounds).
    *
    * Produces CTEs: wf, w0, and per round pc$r / b$r / m$r / w$r. */
  def oracleCtes(docsWhere: String, numMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH RECURSIVE
      wf AS MATERIALIZED (
        SELECT w AS word, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
              FROM documents WHERE $docsWhere)
        WHERE w <> '' GROUP BY w),
      w0 AS MATERIALIZED (
        SELECT word, freq,
          chr(1) || array_to_string(string_split(word, ''), chr(1)) || chr(1)
            AS state
        FROM wf)""")
    for (r <- 1 to numMerges) {
      val p = r - 1
      sb.append(s""",
      pc$r AS MATERIALIZED (
        SELECT s[i] AS a, s[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
        FROM (SELECT freq, s, unnest(range(1, len(s))) AS i
              FROM (SELECT freq,
                      list_filter(string_split(state, chr(1)), x -> x <> '')
                        AS s
                    FROM w$p))
        GROUP BY 1, 2),
      b$r AS MATERIALIZED (
        SELECT a, b,
          chr(1) || a || chr(1) || b || chr(1) AS pat,
          chr(1) || a || b || chr(1) AS rep
        FROM pc$r ORDER BY cnt DESC, a, b LIMIT 1),
      m$r AS (
        SELECT word, freq, state FROM w$p
        UNION ALL
        SELECT m.word, m.freq,
          substr(m.state, 1, strpos(m.state, b.pat) - 1) || b.rep ||
            substr(m.state, strpos(m.state, b.pat) + length(b.pat)) AS state
        FROM m$r m, b$r b WHERE strpos(m.state, b.pat) > 0),
      w$r AS MATERIALIZED (
        SELECT m.word, m.freq, m.state FROM m$r m, b$r b
        WHERE strpos(m.state, b.pat) = 0)""")
    }
    sb.toString
  }
}
