package graft

import java.nio.file.Files

/** Hand pins for wave 12: token-weighted duplication inflation and the
  * embedding centroid-drift monitor (exact integer sums, negative
  * components included). */
class DriftInflationSpec extends SparkSpecBase {

  test("dup inflation: planted copy inflates tokens 10/7") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-infl").toString
    Seq((1L, "a b c"), (60L, "d e f g"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // Corpus = {1, 60, 10001 (copy of 1)}: clusters (3-tok × 2 copies),
    // (4-tok × 1) → total 10, unique 7.
    val r = SparkEntry.queries("q_llm_dup_inflation")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) == (3L, 2L, 1L, 10L, 7L, 14285L))
  }

  private def embDir(rows: Seq[(Long, Seq[Float])]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-drift").toString
    rows.map { case (id, e) => (id, e, 0) }
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def oneHot(d: Int, v: Float): Seq[Float] =
    (0 until 64).map(i => if (i == d) v else 0.0f)

  test("centroid shift: identical sides give cos 1, zero shift") {
    val dir = embDir(Seq(0L, 1L, 2L, 3L).map(i => (i, oneHot(0, 1.0f))))
    val r = SparkEntry.queries("q_llm_centroid_shift")(spark, dir)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(5)) == (2L, 2L, 1000000L, 0L, 0L))
  }

  test("centroid shift: orthogonal sides give cos 0 and the 2^20 shift") {
    val dir = embDir(Seq(
      (0L, oneHot(0, 1.0f)), (2L, oneHot(0, 1.0f)),
      (1L, oneHot(1, 1.0f)), (3L, oneHot(1, 1.0f))))
    val r = SparkEntry.queries("q_llm_centroid_shift")(spark, dir)
      .collect().head
    // shifts: dim0 and dim1 both 2²⁰; lexicographic (shift, d) max → d=1.
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (0L, 1048576L, 1L, 2097152L))
  }

  test("centroid shift: negative components floor consistently") {
    val dir = embDir(Seq(
      (0L, oneHot(0, -0.5f)), (1L, oneHot(0, 0.5f))))
    val r = SparkEntry.queries("q_llm_centroid_shift")(spark, dir)
      .collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      (-1000000L, 1048576L, 0L, 1048576L))
  }

  test("IVF balance: cell accounting is exact and internally consistent") {
    // 40 vectors in two tight directions (e0-heavy, e1-heavy): whatever
    // cells the deterministic seeding lands on, the ACCOUNTING contract
    // holds exactly — points conserve, the max cell bounds the mean,
    // and imbalance4 is the max/mean ratio the query claims.
    val rows = (0 until 40).map { i =>
      val d = i % 2
      (i.toLong, (0 until 64).map(j =>
        if (j == d) 1.0f else if (j == 63) 0.01f * (i % 5) else 0.0f))
    }
    val dir = embDir(rows)
    val r = SparkEntry.queries("q_llm_ivf_balance")(spark, dir)
      .collect().head
    val (k, nPts, nCells, maxC, minC, imb) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(k == 16L && nPts == 40L)
    assert(nCells >= 1L && nCells <= 16L)
    assert(maxC >= (nPts + nCells - 1) / nCells && minC >= 1L)
    assert(imb == maxC * 10000L / (nPts / 16L), "imbalance arithmetic")
  }
}
