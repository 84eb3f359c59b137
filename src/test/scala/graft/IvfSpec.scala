package graft

import graft.llm.{Ivf, Similarity}

/** IVF index spec: probing every cluster must reproduce brute force
  * exactly; probing few clusters must still find the planted neighbor. */
class IvfSpec extends SparkSpecBase {

  private def corpus() = {
    import spark.implicits._
    // 4 well-separated blobs of 25 vectors each in 8-d
    val rnd = new scala.util.Random(7)
    (0 until 100).map { i =>
      val center = i / 25
      val v = Array.tabulate(8)(j =>
        (if (j == center * 2) 10.0f else 0.0f) + rnd.nextFloat() * 0.1f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("nprobe = k reproduces brute force exactly") {
    val c = corpus()
    val q = Seq(10.0, 0.05, 0.05, 0.0, 0.0, 0.0, 0.0, 0.05)
    val idx = Ivf.build(c, "embedding", "vec_id", k = 4)
    val ivf = Ivf.search(idx, q, topK = 10, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.bruteForceTopK(c, "embedding", "vec_id", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ivf == brute)
  }

  test("nprobe = 1 finds neighbors from the query's own blob") {
    val c = corpus()
    val q = Seq(10.0, 0.05, 0.05, 0.0, 0.0, 0.0, 0.0, 0.05) // blob 0 direction
    val idx = Ivf.build(c, "embedding", "vec_id", k = 4)
    val got = Ivf.search(idx, q, topK = 5, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(got.length == 5)
    assert(got.forall(_ < 25), s"expected blob-0 ids, got ${got.toSeq}") // blob 0 = ids 0..24
  }
}
