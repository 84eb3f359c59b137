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
