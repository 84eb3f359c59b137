package graft

import java.nio.file.Files

/** Pins the MMR greedy (q_llm_mmr) on a fixture where diversification
  * actually reorders the picks: a near-duplicate of the top hit must be
  * deferred behind a less-relevant-but-orthogonal document, and the
  * greedy must stop when candidates run out (3 picks from 3 docs, not
  * 10). The DuckDB oracle replays the same greedy, so only a unit pin
  * like this catches a shared sign/weight error in the 7·rel − 3·sim key.
  */
class MmrSpec extends SparkSpecBase {

  test("near-duplicate of the top hit is deferred behind an orthogonal " +
      "lower-relevance doc; greedy exhausts at 3 picks") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mmr").toString
    // Equal lengths (no BM25 length-norm asymmetry); rel(1) > rel(2) > rel(3).
    Seq(
      (1L, "spark join window"),
      (2L, "spark join filler"),
      (3L, "spark filler filler"))
      .toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Docs 1 and 2 share a unit axis (cos4 = 10000); doc 3 is orthogonal.
    val ex = 1.0f +: Seq.fill(63)(0.0f)
    val ey = 0.0f +: 1.0f +: Seq.fill(62)(0.0f)
    Seq((1L, ex), (2L, ex), (3L, ey))
      .toDF("vec_id", "embedding").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("q_llm_mmr")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    // rel_norm4: doc1 10000, doc2 ~3809, doc3 ~842. Pick 2 compares
    // 7·3809 − 3·10000 = −3337 (near-dup) vs 7·842 = 5894 (orthogonal):
    // diversification wins. Pick 3 takes the deferred near-dup with
    // msim 10000.
    assert(out == Seq((1L, 1L, 0L), (2L, 3L, 0L), (3L, 2L, 10000L)))
    val relTop = SparkEntry.queries("q_llm_mmr")(spark, dir)
      .collect().head.getLong(2)
    assert(relTop == 10000L, "top candidate normalizes to exactly 10^4")
  }
}
