package graft

import graft.llm.SemDedup

/** SemDeDup semantic dedup: within-cluster pair recall vs brute force on
  * separable data, representative selection, and the no-duplicates case. */
class SemDedupSpec extends SparkSpecBase {

  private val dim = 8

  // 4 well-separated anchor directions, 5 near-identical points each:
  // same-anchor cosine ≈ 1, cross-anchor ≈ 0 (near-orthogonal anchors).
  private def corpus(): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(9)
    val anchors = Seq(
      Seq(10.0, 0, 0, 0, 0, 0, 0, 0), Seq(0.0, 10, 0, 0, 0, 0, 0, 0),
      Seq(0.0, 0, 10, 0, 0, 0, 0, 0), Seq(0.0, 0, 0, 10, 0, 0, 0, 0))
    (0L until 20L).map { id =>
      val a = anchors((id % 4).toInt)
      id -> a.map(_ + rnd.nextGaussian() * 0.01)
    }
  }

  private def df() = {
    import spark.implicits._
    corpus().toDF("vec_id", "embedding")
  }

  test("semantic pairs equal brute-force pairs on separable clusters") {
    val got = SemDedup.semanticPairs(df(), "embedding", "vec_id",
        k = 4, threshold = 0.99, dim = dim)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (ia, ea) <- corpus(); (ib, eb) <- corpus() if ia < ib
      dot = ea.zip(eb).map { case (x, y) => x * y }.sum
      na = math.sqrt(ea.map(x => x * x).sum)
      nb = math.sqrt(eb.map(x => x * x).sum)
      if dot / (na * nb) >= 0.99
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty && got == brute,
      s"pairs drifted: missing=${brute.diff(got)} extra=${got.diff(brute)}")
  }

  test("dedup keeps exactly the min-id representative per semantic group") {
    val out = SemDedup.semDedup(df(), "embedding", "vec_id",
      k = 4, threshold = 0.99, dim = dim).collect()
    val kept = out.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 3L), s"representatives drifted: $kept")
    assert(out.length == 20)
  }

  test("a corpus with no semantic dups keeps everything") {
    import spark.implicits._
    // one point per anchor direction: all cross-cosines ≈ 0
    val lone = corpus().take(4).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(lone, "embedding", "vec_id",
      k = 2, threshold = 0.99, dim = dim).collect()
    assert(out.forall(_.getBoolean(2)))
  }
}
