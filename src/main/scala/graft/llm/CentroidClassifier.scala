package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic nearest-centroid (Rocchio) classifier in exact integer
  * units — the hash-checkable sibling of the L-BFGS
  * [[QualityClassifier]]: training is one groupBy (per-label count + 64
  * per-dim sums), the model is #labels rows of integer centroids, and
  * inference is a broadcast of that model + an integer squared-L2 argmin
  * per row. Nothing float touches the decision: points quantize on the
  * [[DetKMeans]] 10⁻⁶ grid, centroids are floor(sum/count) (exact — the
  * quotient of < 2⁵³ integers is correctly rounded, same convention as
  * the k-means oracle), distances are exact BIGINTs, and ties break to
  * the smaller label. An external SQL engine replays training AND
  * inference bit-for-bit, which no gradient-trained model allows.
  *
  * Scale shape: training shuffles only the 65 aggregate buffers per
  * label; inference is shuffle-free (broadcast model, row-local argmin
  * via one partial/final min-of-struct pair). The 100 TB cost is one
  * scan each way — the cheapest useful learned gate a data pipeline can
  * run, and the exact-replay baseline to judge fancier classifiers
  * against. */
object CentroidClassifier {

  /** Per-label integer centroid model: (label, n, c[dim]). */
  def fit(train: DataFrame, embCol: String, labelCol: String,
          dim: Int): DataFrame = {
    val u = DetKMeans.toUnits(col(embCol))
    train.select(col(labelCol).cast("long").as("label"), u.as("u"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        array((0 until dim).map(i => sum(element_at(col("u"), i + 1))): _*)
          .as("s"))
      .select(col("label"), col("n"),
        transform(col("s"), s => floor(s.cast("double") / col("n")).cast("long"))
          .as("c"))
  }

  /** Nearest-centroid prediction per row: (id, pred, dist). Ties in the
    * integer distance break to the smaller label. */
  def classify(test: DataFrame, model: DataFrame, idCol: String,
               embCol: String): DataFrame =
    test.select(col(idCol).cast("long").as("id"),
        DetKMeans.toUnits(col(embCol)).as("u"))
      .crossJoin(broadcast(model.select(col("label"), col("c"))))
      .select(col("id"), col("label"), DetKMeans.dist2(col("u"), col("c")).as("d"))
      .groupBy("id")
      .agg(min(struct(col("d"), col("label"))).as("m"))
      .select(col("id"), col("m").getField("label").as("pred"),
        col("m").getField("d").as("dist"))
}
