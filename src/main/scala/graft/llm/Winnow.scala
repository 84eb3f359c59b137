package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every word k-gram, slide a
  * w-hash window, and keep the MINIMUM hash of each window (ties → the
  * RIGHTMOST minimum, the "robust" rule that makes selection stable
  * under local edits). Guarantees: any shared substring of w+k−1 words
  * between two documents shares at least one selected fingerprint, and
  * the expected density is 2/(w+1) — a tunable, position-aware sketch
  * between full shingling (Jaccard, everything kept) and MinHash (no
  * positions at all). The plagiarism/near-dup primitive for pipelines
  * that need to LOCATE overlaps, not just score them.
  *
  * Relational shape: gram hashes via posexplode (scan-side, codegen'd
  * md5), then ONE per-document ordered window min over a packed
  * (hash, reversed-position) integer — argmin with the rightmost tie
  * rule as a plain `min`, no UDF, replayable in any SQL engine. The
  * window partitions by document (bounded length), never the corpus. */
object Winnow {

  /** Position-field width of the packed (hash, reversed-pos) long.
    * The packing needs `pos < PosCap` or the reversed position underflows
    * into the neighbouring hash's range — so the cap must exceed the max
    * gram count of any single document. 2^24 grams ≈ a >100 MB text
    * document (the reference's whole-FILE ceiling is 100 MB, see
    * `app/services/file_processor.py` MAX_FILE_SIZE), so no legal input
    * reaches it; grams at pos ≥ PosCap are dropped (documented
    * truncation) rather than silently corrupting the sketch. The 28-bit
    * md5-prefix hash × 24-bit position uses 52 of a long's 63 bits. */
  val PosCap = 1L << 24

  /** Distinct selected fingerprints per document: (id, pos, fp) where
    * `pos` is the 0-based gram position the fingerprint was taken at.
    * Documents longer than [[PosCap]] grams are truncated at the cap
    * (fingerprints for the first 2^24 grams are still exact). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    val grams = df.select(col(idCol),
        posexplode(TextAnalysis.wordGrams(col(textCol), k)).as(Seq("pos", "gram")))
      .filter(col("pos") < PosCap) // enforce the packing invariant
    // 28-bit md5-prefix hash; packed = hash·2^24 + (2^24−1 − pos) makes
    // min() pick the smallest hash and, within it, the LARGEST position.
    val h = conv(substring(md5(col("gram")), 1, 7), 16, 10).cast("long")
    val packed = h * PosCap + (lit(PosCap - 1) - col("pos"))
    val win = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    grams.select(col(idCol), col("pos"), packed.as("packed"))
      .withColumn("sel", min(col("packed")).over(win))
      // Only full windows select (the first w−1 prefixes are partial).
      .filter(col("pos") >= w - 1)
      .select(col(idCol),
        (lit(PosCap - 1) - pmod(col("sel"), lit(PosCap))).as("pos"),
        expr(s"sel div $PosCap").as("fp"))
      .distinct()
  }

  /** The MOSS "locate the overlap" report: for every document pair
    * sharing ≥ `minShared` winnowed fingerprints, the POSITION SPAN of
    * the shared material in each document — (id_a, id_b, shared_fps,
    * a_lo, a_hi, b_lo, b_hi), where lo/hi are the min/max gram positions
    * at which a shared fingerprint was selected. [[overlapPairs]] says
    * WHO overlaps; this says WHERE (the plagiarism-report half of
    * Schleimer-Wilkerson-Aiken §5 — fingerprints carry positions
    * precisely so matches can be located, not just counted). Same
    * df ≤ maxDf hot-fingerprint guard, so candidate volume stays linear
    * in the fingerprint relation. */
  def overlapSpans(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4, maxDf: Int = 50,
                   minShared: Int = 3): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("pos"), col("fp"))
    val rare = fps.select("id", "fp").distinct()
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val kept = fps.join(rare, Seq("fp"))
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(countDistinct(col("a.fp")).as("shared_fps"),
        min(col("a.pos")).as("a_lo"), max(col("a.pos")).as("a_hi"),
        min(col("b.pos")).as("b_lo"), max(col("b.pos")).as("b_hi"))
      .filter(col("shared_fps") >= minShared)
  }

  /** The MOSS overlap report: document pairs sharing ≥ `minShared`
    * winnowed fingerprints. Fingerprints occurring in more than `maxDf`
    * documents are dropped BEFORE the pair join — corpus-wide boilerplate
    * grams are the hot keys that would otherwise quadratically blow the
    * join (the same stopword-fingerprint guard MOSS applies), and on a
    * shared-vocabulary corpus they carry no overlap signal anyway. The
    * join is bucketed by fingerprint with df ≤ maxDf, so candidate
    * volume is Σ df² ≤ maxDf · Σ df — linear in the fingerprint
    * relation. */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4, maxDf: Int = 50,
                   minShared: Int = 3): DataFrame = {
    val fps = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp")).distinct()
    val rare = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("fp")
    val kept = fps.join(rare, Seq("fp"))
    kept.as("a").join(kept.as("b"),
        col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
  }
}
