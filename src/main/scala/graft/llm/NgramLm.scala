package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Statistical language-model quality scoring (the CCNet idea: rank
  * documents by how well a simple LM trained on trusted text predicts
  * them; low average log-probability ≈ gibberish / boilerplate / OCR
  * noise). Here the LM is an add-one-smoothed token-bigram model — small
  * enough to broadcast, rich enough to separate fluent from degenerate
  * text — trained relationally and applied as one broadcast join.
  *
  * Scale shape: training is two explode → partial/final count aggregates
  * (one shuffle each, keyed by gram — balanced by vocabulary cardinality);
  * the model relations are vocabulary-sized (≪ corpus) and broadcast to
  * the scorer, so SCORING never shuffles the corpus: explode → broadcast
  * join → per-doc aggregate on the doc id the rows already carry. At
  * 100 TB you train on a hash-sampled or trusted subset (CCNet uses
  * Wikipedia) and score everything; the seams here are exactly that —
  * `fit` takes whatever relation you hand it.
  *
  * Determinism: per-bigram log-probs are rounded to 8 decimals and summed
  * as DECIMAL(28,8) — order-independent, so the score is bit-identical
  * across partitionings AND replayable by an external SQL engine. */
object NgramLm {

  /** Trained model: bigram counts, unigram (context) counts, |vocabulary|.
    * Both relations are vocabulary-sized and persisted at fit time —
    * without that, the vocabSize count plus each scorer broadcast would
    * re-run the full-corpus explode+groupBy from scratch (three corpus
    * passes for one fit+score). Call [[Model.release]] when done. */
  final case class Model(bigrams: DataFrame, unigrams: DataFrame, vocabSize: Long) {
    def release(): Unit = { bigrams.unpersist(); unigrams.unpersist(): Unit }
  }

  /** Count bigrams/unigrams over the training relation. Documents with a
    * single token contribute their token as its own "bigram" (the
    * WordNGrams fewer-than-n contract), matching the scorer's gram
    * construction so such docs still hit the model. */
  def fit(train: DataFrame, textCol: String): Model = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bigrams = train
      .select(explode(TextAnalysis.wordGrams(col(textCol), 2)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c2"))
      .persist(lvl)
    val unigrams = train
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
      .persist(lvl)
    Model(bigrams, unigrams, unigrams.count())
  }

  /** Per-bigram smoothed log-prob relation (_id, gram, _logp): the shared
    * scoring core of [[scoreAvgLogProb]] and [[minKScore]]. Each term is
    * rounded to 8 dp THEN decimal-typed, so downstream sums are exact and
    * FP addition order never reaches a result. */
  private def gramLogProbs(docs: DataFrame, idCol: String, textCol: String,
                           model: Model): DataFrame =
    docs.select(col(idCol).as("_id"),
        explode(TextAnalysis.wordGrams(col(textCol), 2)).as("gram"))
      .withColumn("_w1", split(col("gram"), " ").getItem(0))
      .join(broadcast(model.bigrams), Seq("gram"), "left")
      .join(broadcast(model.unigrams.withColumnRenamed("tok", "_w1")),
        Seq("_w1"), "left")
      .withColumn("_logp",
        (floor(log((coalesce(col("c2"), lit(0L)) + 1.0) /
          (coalesce(col("c1"), lit(0L)) + model.vocabSize.toDouble))
          * 1e8 + 0.5) / 1e8).cast(DecimalType(28, 8)))

  /** Average add-one-smoothed bigram log-probability per document:
    * avg over bigrams (w1 w2) of ln((c2 + 1) / (c1(w1) + V)).
    * Higher = more model-like text. Returns (idCol, n_bigrams, avg_logp)
    * with avg_logp rounded to 6 decimals. */
  def scoreAvgLogProb(docs: DataFrame, idCol: String, textCol: String,
                      model: Model): DataFrame = {
    val scored = gramLogProbs(docs, idCol, textCol, model)
    scored.groupBy(col("_id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        // exact decimal sum → double → divide: every step is the same IEEE
        // operation in any engine (decimal/long division is NOT — scale
        // rules differ)
        (floor(sum(col("_logp")).cast("double") / count(lit(1)) * 1e6 + 0.5) / 1e6)
          .as("avg_logp"))
  }

  /** Absolute-discounting bigram score with continuation backoff —
    * Kneser–Ney's two ideas at rational D = 1/2 (Ney, Essen & Kneser
    * 1994; Kneser & Ney 1995; the smoothing add-one demonstrably gets
    * wrong: add-one hands unseen bigrams mass proportional to context
    * frequency, KN hands it to words that complete MANY contexts):
    *
    *   P(w₂|w₁) = max(c₂ − ½, 0)/c₁(w₁) + ½·N₁₊(w₁•)/c₁(w₁) · Pcont(w₂)
    *   Pcont(w₂) = (N₁₊(•w₂) + 1) / (B + V)   (add-one on continuation
    *                                           types so no gram is −∞)
    *
    * with pure continuation backoff P = Pcont when w₁ was never a
    * context. All continuation relations derive from the fitted
    * bigram-TYPE relation (vocabulary-sized, broadcast); scoring keeps
    * [[scoreAvgLogProb]]'s shape — the corpus never shuffles. Same
    * 8 dp-round-then-decimal-sum determinism discipline. Returns
    * (idCol, n_bigrams, kn_logp 6 dp). */
  def scoreKneserNey(docs: DataFrame, idCol: String, textCol: String,
                     model: Model): DataFrame = {
    val fwd = model.bigrams
      .withColumn("_w1", split(col("gram"), " ").getItem(0))
      .groupBy("_w1").agg(count(lit(1)).as("nf"))
    val bwd = model.bigrams
      .withColumn("_w2", split(col("gram"), " ").getItem(1))
      .filter(col("_w2").isNotNull)
      .groupBy("_w2").agg(count(lit(1)).as("nb"))
    val bv = model.bigrams.count().toDouble + model.vocabSize.toDouble
    val terms = docs.select(col(idCol).as("_id"),
        explode(TextAnalysis.wordGrams(col(textCol), 2)).as("gram"))
      .withColumn("_w1", split(col("gram"), " ").getItem(0))
      .withColumn("_w2", split(col("gram"), " ").getItem(1))
      .join(broadcast(model.bigrams), Seq("gram"), "left")
      .join(broadcast(model.unigrams.withColumnRenamed("tok", "_w1")),
        Seq("_w1"), "left")
      .join(broadcast(fwd), Seq("_w1"), "left")
      .join(broadcast(bwd), Seq("_w2"), "left")
      .withColumn("_pc",
        (coalesce(col("nb"), lit(0L)) + lit(1.0)) / lit(bv))
      // nf known ⇒ the token HAS appeared as a context (and so c1 is
      // non-null); a token seen only at document ends backs off to pure
      // continuation — without this gate its p would be exactly 0.
      .withColumn("_p", when(col("nf").isNotNull,
        greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(0.5),
          lit(0.0)) / col("c1")
          + (lit(0.5) * col("nf") / col("c1")) * col("_pc"))
        .otherwise(col("_pc")))
      .withColumn("_logp",
        (floor(log(col("_p")) * 1e8 + 0.5) / 1e8).cast(DecimalType(28, 8)))
    terms.groupBy(col("_id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(col("_logp")).cast("double") / count(lit(1)) * 1e6 + 0.5)
          / 1e6).as("kn_logp"))
  }

  /** Min-K% probability membership signal (Shi et al., ICLR 2024,
    * "Detecting Pretraining Data from Large Language Models"): the mean
    * of each document's LOWEST 20% per-bigram log-probs — member text has
    * few surprising grams, so its worst-k mean sits high; the
    * memorization/contamination probe run against a reference model.
    * Determinism: per-gram terms are the 8 dp-rounded decimals of
    * [[gramLogProbs]]; the per-doc sort is over VALUES (ties
    * interchangeable under a sum), k = ⌈n/5⌉ by integer arithmetic, and
    * the k-smallest sum folds in exact decimal. Row-local after one
    * doc-grouped collect of the per-doc gram list. */
  def minKScore(docs: DataFrame, idCol: String, textCol: String,
                model: Model): DataFrame =
    gramLogProbs(docs, idCol, textCol, model)
      .groupBy(col("_id").as(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(col("_logp"))).as("_lp"))
      .withColumn("k_lowest", expr("(n_bigrams + 4) div 5"))
      .select(col(idCol), col("n_bigrams"), col("k_lowest"),
        expr("floor(CAST(aggregate(slice(_lp, 1, CAST(k_lowest AS INT)), " +
          "CAST(0 AS DECIMAL(28,8)), " +
          "(a, x) -> CAST(a + x AS DECIMAL(28,8))) AS DOUBLE) " +
          "/ k_lowest * 1e6 + 0.5) / 1e6").as("mink_logp"))
}
