package graft

import java.nio.file.Files

/** Hand-computed mutual-kNN fixture: 7 one-hot basis vectors (ids
  * 0..60, dims 1..7 of 64) plus a "hub" v70 with ones in dims 1..7.
  * cos(e_i, e_j) = 0, cos(e_i, hub) = 1/√7 → 377964 in 6dp. Every e_i
  * ranks the hub first then four zero-cos neighbors by dst id; the hub
  * keeps the 5 lowest ids. Reciprocity and per-rank means derive by
  * hand: 8 edges / 6 reciprocal / frac 7500 at EVERY rank; mean_cos6 =
  * 377964 at rank 1 and 47245 at ranks 2–5. */
class KnnGraphSpec extends SparkSpecBase {

  test("sampled kNN graph matches the hand-derived one-hot geometry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-knn").toString
    def vec(hot: Seq[Int]): Seq[Float] =
      (0 until 64).map(d => if (hot.contains(d)) 1.0f else 0.0f)
    val rows = (0 to 6).map(i => (i * 10L, vec(Seq(i + 1)), 0)) :+
      (70L, vec(1 to 7), 0)
    rows.toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")

    val got = SparkEntry.queries("q_llm_knn_graph")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 8L, 377964L, 6L, 7500L),
      (2L, 8L, 47245L, 6L, 7500L),
      (3L, 8L, 47245L, 6L, 7500L),
      (4L, 8L, 47245L, 6L, 7500L),
      (5L, 8L, 47245L, 6L, 7500L)))
  }

  test("non-sampled vec_ids are invisible to the diagnostic") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-knn").toString
    def vec(hot: Seq[Int]): Seq[Float] =
      (0 until 64).map(d => if (hot.contains(d)) 1.0f else 0.0f)
    // Two sampled nodes plus an id-7 decoy that would dominate both
    // rankings if the mod-10 sample leaked.
    Seq((0L, vec(Seq(1)), 0), (10L, vec(Seq(1, 2)), 0),
      (7L, vec(Seq(1)), 0))
      .toDF("vec_id", "embedding", "label")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_llm_knn_graph")(spark, dir).collect()
    // Only (0 ↔ 10): one rank, two edges, both reciprocal, cos = 1/√2.
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ==
      (1L, 2L, 2L, 10000L))
    assert(r.getLong(2) == 707107L, "cos6 of 1/sqrt(2)")
  }
}
