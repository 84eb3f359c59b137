package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive-training data preparation: deterministic negative sampling
  * and curriculum ordering — the pairing/ordering passes an embedding- or
  * reranker-training pipeline runs after curation.
  *
  * Everything here is hash-ordered rather than RNG-ordered (the
  * [[Sampling.splitLabel]] md5 convention): "random" choices are a rank
  * over `md5(anchor:candidate)`, so any engine replays them exactly, a
  * re-run adds no nondeterminism, and there is no seed plumbing. */
object Contrastive {

  /** k pseudo-random negatives per anchor, drawn from the anchor's
    * candidate pool (same md5-prefix bucket, anchor excluded). Pools are
    * the first `poolChars` hex chars of `md5(id)` — 16^poolChars buckets,
    * engine-portable with no hex→int conversion.
    *
    * Scale shape: pools bound the pair blow-up — the within-pool self-join
    * is Σ|pool|² with |pool| ≈ N/16^poolChars (grow poolChars with the
    * corpus, the [[SemDedup]] k rule), and the per-anchor top-k resolves
    * through a rank window that prunes to k rows per partition BEFORE the
    * shuffle (WindowGroupLimit). Output: (anchor_id, neg_id,
    * pick_rank 1..k). */
  def negativeSamples(docs: DataFrame, idCol: String, k: Int,
                      poolChars: Int = 1): DataFrame = {
    val pool = substring(md5(col(idCol).cast("string")), 1, poolChars)
    val a = docs.select(col(idCol).as("anchor_id"),
      pool.as("_pool"))
    val b = docs.select(col(idCol).as("neg_id"), pool.as("_pool"))
    val w = Window.partitionBy("anchor_id").orderBy(col("_h"), col("neg_id"))
    a.join(b, Seq("_pool"))
      .filter(col("anchor_id") =!= col("neg_id"))
      .withColumn("_h", md5(concat(col("anchor_id").cast("string"), lit(":"),
        col("neg_id").cast("string"))))
      .withColumn("pick_rank", row_number().over(w))
      .filter(col("pick_rank") <= k)
      .select(col("anchor_id"), col("neg_id"),
        col("pick_rank").cast("long").as("pick_rank"))
  }

  /** Curriculum ordering: phase documents easiest-first by a difficulty
    * score, then hash-shuffle WITHIN each phase so a training run streams
    * phases in order but sees no secondary ordering bias inside one.
    *
    * Phases are VALUE buckets at exact interpolated percentile boundaries
    * (one tiny aggregate, broadcast back), NOT a global ntile window — a
    * corpus-wide ntile needs a single-partition global sort, the one
    * plan shape this engine never emits. Ties sharing a boundary value
    * land in the same phase (deterministic, engine-portable); the
    * phase_pos window partitions by phase, so it shuffles but never
    * single-partitions. Output adds (phase 1..phases, phase_pos 1..). */
  def curriculum(docs: DataFrame, idCol: String, difficultyCol: String,
                 phases: Int = 4): DataFrame = {
    require(phases >= 2, s"phases must be >= 2, got $phases")
    val cuts = (1 until phases).map(i =>
      expr(s"percentile($difficultyCol, ${i.toDouble / phases})").as(s"_c$i"))
    val bounds = docs.agg(cuts.head, cuts.tail: _*)
    val phase = (1 until phases).map(i =>
      when(col(difficultyCol) > col(s"_c$i"), 1).otherwise(0))
      .reduce(_ + _) + 1
    val inPhase = Window.partitionBy("phase")
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.crossJoin(broadcast(bounds))
      .withColumn("phase", phase)
      .withColumn("phase_pos", row_number().over(inPhase).cast("long"))
      .drop((1 until phases).map(i => s"_c$i"): _*)
  }
}
