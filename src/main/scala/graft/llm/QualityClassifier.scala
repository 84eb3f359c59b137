package graft.llm

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Learned document-quality classifier — the model-based filtering stage of
  * the published LLM curation pipelines (GPT-3 / LLaMA / palm-style: train
  * a linear classifier to distinguish a trusted corpus from raw crawl,
  * keep documents the model scores as trusted).
  *
  * Architecture split:
  *   - TRAINING uses spark.ml logistic regression over a compact
  *     hand-crafted feature vector (the Gopher-style quality signals this
  *     engine already computes natively). Training data volume is whatever
  *     the caller labels; the fit is distributed (L-BFGS over
  *     treeAggregate'd gradients).
  *   - INFERENCE does NOT carry the mllib pipeline: the fitted model
  *     exports as a closed-form `sigmoid(w·x + b)` Column expression over
  *     the same native features ([[Model.scoreColumn]]) — pure codegen'd
  *     arithmetic on the scan side, no UDF, no Vector boxing, usable in
  *     any query the engine runs. At 100 TB the scorer is just another
  *     projected column.
  *
  * Feature vector (all computed by [[TextAnalysis]] kernels, all
  * deterministic): token count (log1p), mean word length, symbol-word
  * ratio, alpha-word fraction, stopword hits (log1p), duplicate-line
  * character fraction. */
object QualityClassifier {

  /** Fitted model: feature weights + intercept, engine-portable. */
  final case class Model(weights: Array[Double], intercept: Double) {
    require(weights.length == FeatureNames.length,
      s"expected ${FeatureNames.length} weights, got ${weights.length}")

    /** Closed-form scorer: P(quality | text) as a pure Column expression. */
    def scoreColumn(text: Column): Column = {
      val margin = features(text).zip(weights).map { case (f, w) => f * w }
        .reduce(_ + _) + lit(intercept)
      lit(1.0) / (lit(1.0) + exp(-margin))
    }
  }

  val FeatureNames: Seq[String] = Seq(
    "log_tokens", "mean_word_len", "symbol_ratio", "alpha_frac",
    "log_stopwords", "dup_line_char_frac")

  private val Stopwords =
    Seq("the", "a", "an", "of", "to", "in", "and", "is", "on", "for")

  /** The shared feature expressions (train and serve read identical
    * values, so there is no training/serving skew by construction). */
  def features(text: Column): Seq[Column] = Seq(
    log1p(TextAnalysis.tokenCount(text).cast("double")),
    TextAnalysis.meanWordLen(text),
    TextAnalysis.symbolWordRatio(text),
    TextAnalysis.alphaWordFrac(text),
    log1p(TextAnalysis.stopwordHits(text, Stopwords).cast("double")),
    TextAnalysis.dupLineCharFrac(text))

  /** Deterministic low-quality corruption used for weak supervision when
    * no labeled negative corpus exists: replace every 3rd token with
    * symbol noise and stutter-duplicate every 4th (the classic junk
    * signatures — symbol spam and repetition). Seeded by token position,
    * not RNG, so labels are reproducible across engines and runs. */
  def corrupt(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val mangled = transform(toks, (t, i) =>
      when(pmod(i, lit(3)) === 0, lit("##$%@!"))
        .when(pmod(i, lit(4)) === 0, concat(t, lit(" "), t, lit(" "), t))
        .otherwise(t))
    array_join(mangled, " ")
  }

  /** Fit on (positive = `docs` as-is, negative = corrupted copies). Returns
    * the portable [[Model]]. */
  def train(docs: DataFrame, textCol: String, maxIter: Int = 50,
            regParam: Double = 0.01): Model = {
    val pos = docs.select(col(textCol).as("text")).withColumn("label", lit(1.0))
    val neg = docs.select(corrupt(col(textCol)).as("text"))
      .withColumn("label", lit(0.0))
    val labeled = pos.unionByName(neg).select(col("label"),
      array_to_vector(array(features(col("text")): _*)).as("features"))
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setStandardization(true)
    val fitted = lr.fit(labeled)
    Model(fitted.coefficients.toArray, fitted.intercept)
  }

  /** Score a corpus: (idCol, quality_score rounded to 6 dp). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: Model): DataFrame =
    docs.select(col(idCol),
      (floor(model.scoreColumn(col(textCol)) * 1e6 + 0.5) / 1e6)
        .as("quality_score"))
}
