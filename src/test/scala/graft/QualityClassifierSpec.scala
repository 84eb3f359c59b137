package graft

import org.apache.spark.sql.functions._

import graft.llm.QualityClassifier

class QualityClassifierSpec extends SparkSpecBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("classifier separates clean from corrupted text (holdout >= 0.9)") {
    // Split by doc_id parity: train on even ids, evaluate on odd — the
    // eval docs (and their corruptions) are never seen in training.
    val train = docs.filter(col("doc_id") % 2 === 0)
    val eval = docs.filter(col("doc_id") % 2 === 1)
    val model = QualityClassifier.train(train, "text")
    val cleanScores = QualityClassifier.score(eval, "doc_id", "text", model)
    val dirtyScores = QualityClassifier.score(
      eval.select(col("doc_id"),
        QualityClassifier.corrupt(col("text")).as("text")),
      "doc_id", "text", model)
    def accuracy(df: org.apache.spark.sql.DataFrame, wantHigh: Boolean): Double = {
      val hit = if (wantHigh) col("quality_score") > 0.5
                else col("quality_score") < 0.5
      df.agg(avg(hit.cast("double"))).head.getDouble(0)
    }
    val (accClean, accDirty) =
      (accuracy(cleanScores, wantHigh = true), accuracy(dirtyScores, wantHigh = false))
    assert(accClean >= 0.9, s"clean accuracy $accClean")
    assert(accDirty >= 0.9, s"corrupted accuracy $accDirty")
  }

  test("closed-form Column scorer matches the mllib model's probability") {
    import spark.implicits._
    val model = QualityClassifier.train(docs.limit(60), "text")
    // Recompute P(1|x) by hand from exported weights on a few rows and
    // compare to the Column scorer (same features, same sigmoid).
    val sample = docs.limit(5)
    val viaColumn = QualityClassifier.score(sample, "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.getDouble(1))
    val feats = sample
      .select(col("doc_id"),
        array(QualityClassifier.features(col("text")): _*).as("f"))
      .orderBy("doc_id").collect()
      .map(_.getSeq[Double](1))
    val byHand = feats.map { f =>
      val margin = f.zip(model.weights).map { case (x, w) => x * w }.sum +
        model.intercept
      val p = 1.0 / (1.0 + math.exp(-margin))
      math.floor(p * 1e6 + 0.5) / 1e6
    }
    assert(viaColumn.toSeq == byHand.toSeq)
  }

  test("frozen registry weights classify like a fresh fit (>= 0.9 both ways)") {
    // q_llm_quality_clf serves a FROZEN weight vector (trained once on
    // sf0.01, 6dp-rounded) so its oracle can replay the sigmoid in SQL.
    // Freezing must not cost classification power: the frozen scorer has
    // to separate clean from corrupted sf0.001 docs (cross-SF holdout —
    // this corpus is not what the frozen weights were fitted on).
    val frozen = graft.queries.Registry.frozenQualityModel
    val clean = QualityClassifier.score(docs, "doc_id", "text", frozen)
    val dirty = QualityClassifier.score(
      docs.select(col("doc_id"),
        QualityClassifier.corrupt(col("text")).as("text")),
      "doc_id", "text", frozen)
    val accClean = clean.agg(avg((col("quality_score") > 0.5).cast("double")))
      .head.getDouble(0)
    val accDirty = dirty.agg(avg((col("quality_score") < 0.5).cast("double")))
      .head.getDouble(0)
    assert(accClean >= 0.9, s"frozen clean accuracy $accClean")
    assert(accDirty >= 0.9, s"frozen corrupted accuracy $accDirty")
  }

  test("corruption is deterministic and actually degrades the features") {
    val c1 = docs.select(QualityClassifier.corrupt(col("text")).as("t"))
      .orderBy("t").collect().map(_.getString(0)).toSeq
    val c2 = docs.select(QualityClassifier.corrupt(col("text")).as("t"))
      .orderBy("t").collect().map(_.getString(0)).toSeq
    assert(c1 == c2)
    val symClean = docs
      .agg(avg(graft.llm.TextAnalysis.symbolWordRatio(col("text"))))
      .head.getDouble(0)
    val symDirty = docs
      .select(QualityClassifier.corrupt(col("text")).as("t"))
      .agg(avg(graft.llm.TextAnalysis.symbolWordRatio(col("t"))))
      .head.getDouble(0)
    assert(symDirty > symClean + 0.1,
      s"corruption too weak: clean=$symClean dirty=$symDirty")
  }
}
