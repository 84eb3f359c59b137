package graft

import java.nio.file.Files

/** Round-15 pins for q_llm_search_ndcg: the shared weight table against
  * an in-test recompute, the all-equal-grades identity (NDCG = 10⁶ for
  * any permutation of uniform grades), the pool-count IDCG formula on a
  * mixed-grade query (order-independent), the internal
  * dcg/idcg/ndcg consistency identity, and zero-candidate sentinels. */
class NdcgSpec extends SparkSpecBase {

  private def w(i: Int): Long =
    math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong

  private def run(texts: Seq[String]) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ndcg").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q_llm_search_ndcg")(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") -> r).toMap
  }

  test("uniform grades: any ranking of all-rel-2 docs reads NDCG = 1e6") {
    // Three docs all holding both q1 terms (plus distinct filler so the
    // BM25 order is nontrivial); grades all equal 3 ⇒ DCG = IDCG.
    val got = run(Seq(
      "data query alpha alpha alpha",
      "data query beta",
      "data data query query gamma gamma gamma gamma"))
    val q1 = got(1L)
    assert(q1.getAs[Long]("n2") == 3L && q1.getAs[Long]("n1") == 0L)
    assert(q1.getAs[Long]("dcg_micro") == q1.getAs[Long]("idcg_micro"))
    assert(q1.getAs[Long]("ndcg_micro") == 1000000L)
    assert(q1.getAs[Long]("idcg_micro") == 3 * (w(1) + w(2) + w(3)),
      "IDCG from the shared weight table: three gain-3 slots")
  }

  test("mixed grades: IDCG is the pool-count formula; ndcg = dcg*1e6/idcg") {
    // q2 (spark, join): one rel-2 doc, one rel-1 doc — IDCG is fixed by
    // the counts (3·W1 + W2) no matter how BM25 orders the pool, and the
    // DCG must be one of the two permutations' values.
    val got = run(Seq("spark join", "spark spark filler filler"))
    val q2 = got(2L)
    assert(q2.getAs[Long]("n2") == 1L && q2.getAs[Long]("n1") == 1L)
    val idcg = 3 * w(1) + w(2)
    assert(q2.getAs[Long]("idcg_micro") == idcg)
    val dcg = q2.getAs[Long]("dcg_micro")
    assert(dcg == 3 * w(1) + w(2) || dcg == w(1) + 3 * w(2),
      s"dcg $dcg must be a permutation of {3·W1+W2, W1+3·W2}")
    assert(q2.getAs[Long]("ndcg_micro") == dcg * 1000000L / idcg)
    assert(q2.getAs[Long]("ndcg_micro") <= 1000000L)
  }

  test("zero-candidate queries read all-zero sentinels; the mean divides by 5") {
    val got = run(Seq("data query"))
    (2L to 5L).foreach { qid =>
      val r = got(qid)
      assert(r.getAs[Long]("n_candidates") == 0L)
      assert(r.getAs[Long]("dcg_micro") == 0L)
      assert(r.getAs[Long]("idcg_micro") == 0L)
      assert(r.getAs[Long]("ndcg_micro") == 0L)
    }
    val total = got.values.map(_.getAs[Long]("ndcg_micro")).sum
    got.values.foreach(r =>
      assert(r.getAs[Long]("mean_ndcg_micro") == total / 5))
  }
}
