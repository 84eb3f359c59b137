package graft

/** Round-15 pins for q_llm_mcc on the real sf0.001 corpus: the four
  * cells partition the corpus, the signed-squared expression matches an
  * in-test BigInt recompute, and the value sits in the legal band. */
class MccSpec extends SparkSpecBase {

  test("cells partition the corpus and mcc2_s8 matches the BigInt algebra") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .count()
    val r = SparkEntry.queries("q_llm_mcc")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp + fp + fn + tn == docs, "four cells partition the corpus")
    val num = BigInt(tp) * tn - BigInt(fp) * fn
    val den = BigInt(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    val expected =
      if (den == 0) BigInt(0)
      else if (num >= 0) num * num * 100000000 / den
      else -(num * num * 100000000 / den)
    assert(BigInt(r.getAs[Long]("mcc2_s8")) == expected)
    assert(math.abs(r.getAs[Long]("mcc2_s8")) <= 100000000L,
      "squared correlation is bounded by 1")
  }
}
