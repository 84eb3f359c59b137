package graft

import graft.llm.Pca

/** Power-iteration PCA: the recovered direction must match hand-known
  * dominant axes, with the deterministic sign and 1e4 normalization the
  * oracle replays. */
class PcaSpec extends SparkSpecBase {

  private def pc1(vecs: Seq[Seq[Double]], rounds: Int = 8): Array[Long] = {
    import spark.implicits._
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    Pca.topComponent(df, "vec_id", "embedding", dim = vecs.head.size, rounds)
      .orderBy("dim").collect().map(_.getLong(1))
  }

  test("points spread along a known direction recover it") {
    // Perfect rank-1 spread along (3, 4): covariance is (3,4)(3,4)^T
    // scaled, whose top eigenvector is exactly ±(3, 4)/5. After max-1e4
    // normalization the components must sit at ratio 3:4 with the larger
    // at the 1e4 cap (quantization-exact here: units are whole numbers).
    val v = pc1(Seq(Seq(0.3, 0.4), Seq(-0.3, -0.4), Seq(0.6, 0.8),
      Seq(0.0, 0.0)))
    assert(math.abs(v(1)) == Pca.Scale, s"max component normalized: ${v.toSeq}")
    assert(v(0) * 4 == v(1) * 3, s"direction ratio 3:4: ${v.toSeq}")
  }

  test("dominant-variance axis wins over a weaker orthogonal spread") {
    // x-axis spread ±0.9, y-axis spread ±0.1: pc1 is the x axis; the
    // y component must collapse to ~0 after 8 rounds (ratio 81:1 per
    // round drives it below one 1e-4 unit almost immediately).
    val v = pc1(Seq(Seq(0.9, 0.1), Seq(-0.9, 0.1), Seq(0.9, -0.1),
      Seq(-0.9, -0.1)))
    assert(math.abs(v(0)) == Pca.Scale)
    assert(math.abs(v(1)) <= 2, s"minor axis suppressed: ${v.toSeq}")
  }

  test("mean-centering: a large common offset does not become the axis") {
    // All points near (0.5, 0.5) but varying only in x: without the
    // N·S − m·m centering, the offset direction (1,1) would dominate.
    val v = pc1(Seq(Seq(0.6, 0.5), Seq(0.4, 0.5), Seq(0.55, 0.5),
      Seq(0.45, 0.5)))
    assert(math.abs(v(0)) == Pca.Scale)
    assert(v(1) == 0L, s"constant dimension has zero loading: ${v.toSeq}")
  }

  test("deterministic across runs and row order") {
    val pts = Seq(Seq(0.2, 0.7, 0.1), Seq(0.9, 0.1, 0.4),
      Seq(0.3, 0.3, 0.3), Seq(0.7, 0.2, 0.9))
    assert(pc1(pts).toSeq == pc1(pts.reverse).toSeq,
      "moments are order-independent integer sums")
  }

  test("arrays longer than dim are sliced, mirroring the oracle's [1:dim]") {
    // Same 2-D spread as the rank-1 test but with two junk trailing
    // dims; dim = 2 must ignore them (the oracle slices emb[1:dim], and
    // un-sliced Spark would crash indexing past dim).
    import spark.implicits._
    val base = Seq(Seq(0.3, 0.4), Seq(-0.3, -0.4), Seq(0.6, 0.8),
      Seq(0.0, 0.0))
    val padded = base.map(_ ++ Seq(9.9, -9.9))
    val df = padded.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val v = Pca.topComponent(df, "vec_id", "embedding", dim = 2, rounds = 8)
      .orderBy("dim").collect().map(_.getLong(1))
    assert(v.length == 2 && math.abs(v(1)) == Pca.Scale && v(0) * 4 == v(1) * 3,
      s"junk dims ignored: ${v.toSeq}")
  }
}
