package graft

import org.apache.spark.sql.functions._

import graft.llm.CentroidClassifier

/** Nearest-centroid classifier: hand-checkable centroids, exact integer
  * decisions, ties to the smaller label. */
class CentroidClassifierSpec extends SparkSpecBase {

  test("centroids are per-label floor(sum/n) in integer units") {
    import spark.implicits._
    val train = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(2.0f, 3.0f)),   // sums 3e6, 5e6; n=2
      (1, Array(-1.0f, 0.5f)))
      .toDF("label", "e")
    val m = CentroidClassifier.fit(train, "e", "label", 2)
      .orderBy("label").collect()
    assert(m(0).getSeq[Long](2) == Seq(1500000L, 2500000L))
    assert(m(1).getSeq[Long](2) == Seq(-1000000L, 500000L))
  }

  test("held-out points go to the nearest centroid; ties break low") {
    import spark.implicits._
    val train = Seq(
      (0, Array(0.0f, 0.0f)), (1, Array(10.0f, 0.0f)), (2, Array(0.0f, 10.0f)))
      .toDF("label", "e")
    val model = CentroidClassifier.fit(train, "e", "label", 2)
    val test = Seq(
      (100L, Array(1.0f, 1.0f)),   // nearest: label 0
      (101L, Array(9.0f, 1.0f)),   // nearest: label 1
      (102L, Array(5.0f, 0.0f)))   // equidistant 0/1 -> tie to 0
      .toDF("id", "e")
    val preds = CentroidClassifier.classify(test, model, "id", "e")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(preds == Map(100L -> 0L, 101L -> 1L, 102L -> 0L))
  }

  test("separable clusters classify their held-out halves correctly") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val data = (0 until 400).map { i =>
      val label = (i / 2) % 4   // even/odd ids both cover every label
      val center = Array.tabulate(8)(d => if (d == label * 2) 5.0f else 0.0f)
      (i.toLong, label, center.map(c => c + rnd.nextFloat() - 0.5f))
    }.toDF("id", "label", "e")
    val model = CentroidClassifier.fit(
      data.filter(col("id") % 2 === 0), "e", "label", 8)
    val acc = CentroidClassifier.classify(
        data.filter(col("id") % 2 === 1), model, "id", "e")
      .join(data.select(col("id"), col("label").cast("long").as("want")), Seq("id"))
      .agg(avg(when(col("pred") === col("want"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(acc == 1.0, s"separable data must classify perfectly, got $acc")
  }
}
