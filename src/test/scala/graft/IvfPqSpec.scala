package graft

import graft.llm.IvfPq

/** IVF-PQ specs: residual-ADC exactness on codebook-aligned data, recall
  * under single-cluster probing, and probe pruning. */
class IvfPqSpec extends SparkSpecBase {

  private val dim = 8

  // Two far-apart blobs; within each blob the SAME 4 constant delta
  // patterns (×2 copies). Coarse k=2 recovers the blob means; residuals
  // then take exactly 4 distinct values per subspace, so a kSub=4 product
  // quantizer recovers them exactly and ADC distances are EXACT.
  private def corpus(): Seq[(Long, Seq[Double])] = {
    val centers = Seq(Seq.fill(dim)(100.0), Seq.fill(dim)(-100.0))
    val deltas = Seq(1.0, 2.0, 3.0, 4.0).map(v => Seq.fill(dim)(v))
    for {
      (c, ci) <- centers.zipWithIndex
      (d, di) <- deltas.zipWithIndex
      copy <- 0 until 2
    } yield (ci * 100L + di * 10L + copy,
      c.zip(d).map { case (a, b) => a + b + copy * 0.0 })
  }

  private def df() = {
    import spark.implicits._
    corpus().toDF("vec_id", "embedding")
  }

  private def bruteOrder(q: Seq[Double]): Seq[Long] =
    corpus().map { case (id, e) =>
      (id, e.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy { case (id, d) => (d, id) }.map(_._1)

  test("residual ADC is exact when residuals sit on the learned codebooks") {
    val idx = IvfPq.build(df(), "embedding", "vec_id",
      kCoarse = 2, m = 4, kSub = 4, dim = dim)
    val q = Seq.fill(dim)(101.6) // near blob 0, between delta patterns
    val got = IvfPq.search(idx, q, topK = 8, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got == bruteOrder(q).take(8),
      s"ADC order must equal exact order: got=$got want=${bruteOrder(q).take(8)}")
  }

  test("nprobe=1 answers from the query's own blob") {
    val idx = IvfPq.build(df(), "embedding", "vec_id",
      kCoarse = 2, m = 4, kSub = 4, dim = dim)
    val got = IvfPq.search(idx, Seq.fill(dim)(-97.0), topK = 4, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(got.forall(_ >= 100L), s"all hits must be blob-1 ids: ${got.toSeq}")
  }

  test("probing scans only the probed cluster's rows") {
    val idx = IvfPq.build(df(), "embedding", "vec_id",
      kCoarse = 2, m = 4, kSub = 4, dim = dim)
    val perCluster = idx.encoded.groupBy("_cluster").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probedRows = idx.encoded
      .filter(org.apache.spark.sql.functions.col("_cluster").isin(0))
      .count()
    assert(probedRows == perCluster(0) && probedRows < corpus().size)
  }

  test("search is deterministic under a fixed seed") {
    def run() = {
      val idx = IvfPq.build(df(), "embedding", "vec_id",
        kCoarse = 2, m = 4, kSub = 4, dim = dim)
      IvfPq.search(idx, Seq.fill(dim)(102.0), topK = 5, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    assert(run() == run())
  }

  test("refined search returns the exact brute-force order and distances") {
    val idx = IvfPq.build(df(), "embedding", "vec_id",
      kCoarse = 2, m = 4, kSub = 4, dim = dim)
    val q = Seq.fill(dim)(101.3)
    val got = IvfPq.searchRefined(idx, df(), "embedding", q,
        topK = 4, nprobe = 2, refineFactor = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == bruteOrder(q).take(4))
    // exact_dist is the TRUE squared L2, hand-recomputed
    val byId = corpus().toMap
    got.foreach { case (id, d) =>
      val expect = byId(id).zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(d - expect) < 1e-6, s"id $id: $d vs $expect")
    }
  }
}
