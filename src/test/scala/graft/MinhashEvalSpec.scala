package graft

import java.nio.file.Files

/** Pins for the md5-space MinHash evaluation loop: the planted mutated
  * pair must be recalled; the degenerate short-doc plant must fall out
  * of the truth set without tripping any division. */
class MinhashEvalSpec extends SparkSpecBase {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mheval").toString
    rows.map { case (id, txt) => (id, txt, "en", "web", txt.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted near-dup is candidate, verified, and recalled") {
    // doc 4 (< 30, even → sampled) gets the mutated negative-id twin
    // (-(doc_id+1) = -5): 20 shared tokens →
    // J(orig, twin) = 18/23 ≈ 0.78 ≥ τ. Unrelated docs share no grams.
    val base = (0 until 20).map(i => s"tok$i").mkString(" ")
    val other = (0 until 20).map(i => s"zzz$i").mkString(" ")
    val dir = docsDir(Seq((4L, base), (40L, other)))
    val r = SparkEntry.queries("q_llm_minhash_eval")(spark, dir)
      .collect().head
    val (nCand, nVer, prec, nTruth, nHits, rec) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    assert(nTruth == 1L, "one planted pair above tau")
    assert(nHits == 1L && rec == 10000L,
      "identical-banded twin must be recalled")
    assert(nVer >= 1L && nVer <= nCand)
    assert(prec == nVer * 10000L / nCand)
    // est/exact error is bounded: 32 perms on a 0.78-Jaccard pair stay
    // within ~3500 micro-units of exact with near-certainty.
    assert(r.isNullAt(6) || r.getLong(6) <= 3500L)
  }

  test("short-doc plant below tau leaves the truth set empty, no crash") {
    // 1-gram doc: J(orig, +marker twin) = 1/4 = 0.25 < 0.5 → n_truth 0,
    // recall NULL; nothing divides by zero on either engine.
    val dir = docsDir(Seq((6L, "x y z")))
    val r = SparkEntry.queries("q_llm_minhash_eval")(spark, dir)
      .collect().head
    assert(r.getLong(3) == 0L, "n_truth")
    assert(r.isNullAt(5), "recall4 NULL when no truth")
  }
}
