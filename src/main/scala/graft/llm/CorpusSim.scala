package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-pair overlap estimation from MinHash signatures — "how much of
  * source A's n-gram vocabulary does source B share?" across every pair
  * of sources, without ever joining the gram sets cross-corpus.
  *
  * Per source, component j of the signature is the minimum over the
  * source's distinct word n-grams of a 52-bit md5-derived value
  * (`md5("j:gram")` first 13 hex chars — the same engine-portable hash
  * family as [[graft.expressions.MdBloom]]); by the classic MinHash
  * argument (Broder 1997, On the resemblance and containment of
  * documents) P[sig_a(j) = sig_b(j)] = Jaccard(A, B), so the fraction of
  * agreeing components estimates vocabulary overlap with standard error
  * 1/√numPerms.
  *
  * The scale story IS the signature: each corpus collapses to numPerms
  * longs in one aggregation pass (min is partial-aggregated map-side, so
  * the shuffle carries one candidate row per partition per source), and
  * the pairwise comparison is over a |sources|² relation of tiny arrays.
  * The exact alternative — distinct grams per source, self-joined across
  * sources — ships the full gram vocabulary of a 100 TB corpus through
  * an exchange once per source pair. The md5 derivation is what makes
  * the estimate (not just some bound on it) reproducible bit-for-bit by
  * an external SQL engine, false collisions included. */
object CorpusSim {

  private def mdHash52(j: Int, gram: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), gram)), 1, 13), 16, 10).cast("long")

  /** One document's own MinHash signature as a scan-side column — the
    * unit the streaming maintainer ([[graft.streaming.EventStream
    * .streamingSignatures]]) folds with componentwise min. Empty gram
    * arrays yield null components only for empty text; callers filter. */
  def perDocSignature(text: Column, n: Int = 3, numPerms: Int = 64): Column =
    array((0 until numPerms).map(j =>
      array_min(transform(Dedup.shingles(text, n), g => mdHash52(j, g)))): _*)

  /** (group, signature array) — one row per group. */
  def signatures(df: DataFrame, groupCol: String, textCol: String,
                 n: Int = 3, numPerms: Int = 64): DataFrame = {
    val grams = df
      .select(col(groupCol).as("grp"),
        explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    grams.groupBy("grp")
      .agg(array((0 until numPerms).map(j => min(mdHash52(j, col("gram")))): _*)
        .as("sig"))
  }

  /** Per-document n-gram novelty: the fraction of a doc's distinct
    * n-grams that occur in NO other document — high novelty marks unique
    * content, near-zero novelty marks boilerplate or near-duplicates that
    * slipped past exact dedup. Corpus-level document frequency is one
    * gram-keyed aggregation (map-side combined); the per-doc fraction is
    * a second key-partitioned agg — the same two-exchange shape as the
    * line-dedup and TF-IDF passes, nothing quadratic. df == 1 means "this
    * doc only" because grams are per-doc distinct before counting. */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 5): DataFrame = {
    val grams = df
      .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val gramDf = grams.groupBy("gram").agg(count(lit(1)).as("df"))
    grams.join(gramDf, "gram")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id"), col("n_grams"), col("n_novel"),
        (floor(col("n_novel") / col("n_grams").cast("double") * 10000
          + lit(0.5)) / 10000).as("novelty"))
  }

  /** All group pairs (src_a < src_b) with agreeing-component count and
    * the implied Jaccard estimate, floor-rounded to 4dp. */
  def overlapMatrix(df: DataFrame, groupCol: String, textCol: String,
                    n: Int = 3, numPerms: Int = 64): DataFrame = {
    val sigs = signatures(df, groupCol, textCol, n, numPerms)
    val a = sigs.select(col("grp").as("src_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("grp").as("src_b"), col("sig").as("sig_b"))
    a.join(broadcast(b), col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("n_agree"))
      .select(col("src_a"), col("src_b"), col("n_agree"),
        (floor(col("n_agree") / numPerms.toDouble * 10000 + lit(0.5)) / 10000)
          .as("jaccard_est"))
      .orderBy("src_a", "src_b")
  }
}
