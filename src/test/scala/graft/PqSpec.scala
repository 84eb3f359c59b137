package graft

import graft.llm.Pq

/** Product-quantization specs: exactness when vectors sit on centroids,
  * determinism, and recall against brute force on separable data. */
class PqSpec extends SparkSpecBase {

  private val dim = 8

  private def vecs(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toSeq.toDF("vec_id", "embedding")
  }

  // Well-separated synthetic corpus: 4 tight clusters at distant anchors.
  private def clustered(): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(5)
    val anchors = Seq(
      Seq.fill(dim)(0.0), Seq.fill(dim)(10.0),
      (0 until dim).map(i => if (i % 2 == 0) 20.0 else -20.0).toSeq,
      (0 until dim).map(i => i * 5.0).toSeq)
    (0L until 40L).map { id =>
      val a = anchors((id % 4).toInt)
      id -> a.map(_ + rnd.nextGaussian() * 0.05)
    }
  }

  test("codes are deterministic and bounded by k") {
    val d = vecs(clustered(): _*)
    val model = Pq.fit(d, "embedding", dim, m = 4, k = 4, seed = 7)
    val codes1 = Pq.encode(d, "embedding", model)
      .select("vec_id", "pq_codes").orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    val model2 = Pq.fit(d, "embedding", dim, m = 4, k = 4, seed = 7)
    val codes2 = Pq.encode(d, "embedding", model2)
      .select("vec_id", "pq_codes").orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1))
    assert(codes1.toSeq == codes2.toSeq, "same seed must give same codes")
    codes1.foreach { case (_, cs) =>
      assert(cs.length == 4 && cs.forall(c => c >= 0 && c < 4))
    }
  }

  test("ADC distance is exact when the corpus sits on the learned centroids") {
    // A corpus with exactly k distinct subvectors per subspace: Lloyd's
    // must recover them exactly (init = the k distinct points, one
    // zero-movement iteration), so every point's ADC self-distance is
    // EXACTLY zero and the top-k is its own anchor group.
    val anchors = Seq(
      Seq.fill(dim)(0.0), Seq.fill(dim)(10.0),
      (0 until dim).map(i => if (i % 2 == 0) 20.0 else -20.0).toSeq,
      (0 until dim).map(i => i * 5.0).toSeq)
    val data = (0L until 40L).map(id => id -> anchors((id % 4).toInt))
    val d = vecs(data: _*)
    val model = Pq.fit(d, "embedding", dim, m = 4, k = 4, seed = 7)
    val encoded = Pq.encode(d, "embedding", model)
    val top = Pq.search(encoded, "vec_id", model, anchors(0), topK = 10).collect()
    assert(top.forall(_.getDouble(1) == 0.0),
      s"anchor-group distances must be exactly 0: ${top.map(_.getDouble(1)).toSeq}")
    assert(top.map(_.getLong(0)).toSet == (0L until 40L by 4).toSet,
      s"top-10 must be exactly the anchor-0 group: ${top.map(_.getLong(0)).toSeq}")
  }

  test("PQ top-k recalls brute-force top-k on separable clusters") {
    val d = vecs(clustered(): _*)
    val model = Pq.fit(d, "embedding", dim, m = 4, k = 8, seed = 11)
    val encoded = Pq.encode(d, "embedding", model)
    val q = clustered().find(_._1 == 1L).get._2
    val pq = Pq.search(encoded, "vec_id", model, q, topK = 5)
      .collect().map(_.getLong(0)).toSet
    // Brute-force squared-L2 top-5 on the driver (40 vectors).
    val brute = clustered()
      .map { case (id, e) =>
        id -> e.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      }
      .sortBy { case (id, dist) => (dist, id) }.take(5).map(_._1).toSet
    val recall = pq.intersect(brute).size / 5.0
    assert(recall >= 0.8, s"recall@5 $recall too low: pq=$pq brute=$brute")
  }

  test("fit trains on a sample but encodes everything") {
    val d = vecs(clustered(): _*)
    val model = Pq.fit(d, "embedding", dim, m = 4, k = 4, seed = 3,
      sampleFraction = 0.5)
    assert(Pq.encode(d, "embedding", model).count() == 40L)
  }
}
