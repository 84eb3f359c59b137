package graft

/** Round-15 pins for q_llm_pr_curve on the real sf0.001 corpus:
  * threshold-sweep structure (21 rows at 500-unit steps), the t₄=0
  * everything-positive anchor (recall 10⁴, fn 0), monotone shrinkage of
  * the predicted-positive set, and the prec/rec/F1 identities recomputed
  * from the confusion counts the query itself reports. */
class PrCurveSpec extends SparkSpecBase {

  private lazy val rows =
    SparkEntry.queries("q_llm_pr_curve")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("t4"), r.getAs[Long]("tp"),
        r.getAs[Long]("fp"), r.getAs[Long]("fn"), r.getAs[Long]("prec4"),
        r.getAs[Long]("rec4"), r.getAs[Long]("f1_4"))).toSeq

  test("21 thresholds; t4=0 predicts everything positive") {
    assert(rows.map(_._1) == (0L to 10000L by 500L))
    val head = rows.head
    assert(head._4 == 0L, "no false negatives at threshold 0")
    assert(head._6 == 10000L, "recall is exactly 1 at threshold 0")
    assert(head._2 > 0L, "the corpus has gopher-positive docs")
  }

  test("predicted-positive mass shrinks monotonically with the threshold") {
    val predicted = rows.map(r => r._2 + r._3)
    assert(predicted.zip(predicted.tail).forall { case (a, b) => a >= b })
    val recalls = rows.map(_._6)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      "recall can only fall as the gate tightens")
  }

  test("prec/rec/F1 match the identities over the reported counts") {
    val totPos = rows.head._2
    rows.foreach { case (t4, tp, fp, fn, prec4, rec4, f1) =>
      assert(tp + fn == totPos, s"t4=$t4: tp+fn must equal total positives")
      assert(prec4 == (if (tp + fp == 0) 0L else tp * 10000 / (tp + fp)))
      assert(rec4 == (if (totPos == 0) 0L else tp * 10000 / totPos))
      assert(f1 == (if (prec4 + rec4 == 0) 0L
        else 2 * prec4 * rec4 / (prec4 + rec4)))
    }
  }
}
