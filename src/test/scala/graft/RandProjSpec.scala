package graft

import org.apache.spark.sql.functions._

import graft.llm.{RandProj, Similarity}

/** JL random projection: engine output matches a driver-side replay of
  * the md5 plane family, and scaled distances are preserved within the
  * JL envelope on separable data. */
class RandProjSpec extends SparkSpecBase {

  test("projection matches a driver-side dot against the same planes") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (2L, Array.tabulate(8)(i => (if (i % 2 == 0) 1 else -1).toFloat)))
    val got = RandProj.project(vecs.toDF("id", "e"), "id", "e",
        kOut = 4, dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val planes = Similarity.hyperplanes(4, 8)
    vecs.foreach { case (id, v) =>
      val want = planes.map { p =>
        val d = v.indices.foldLeft(0.0)((acc, i) => acc + v(i).toDouble * p(i))
        math.floor(d * 1e6 + 0.5) / 1e6
      }
      assert(got(id) == want, s"vec $id")
    }
  }

  test("scaled pairwise distances stay within the JL envelope") {
    import spark.implicits._
    // Uniform [-1,1) plane components have E[c²] = 1/3, so E‖proj‖² =
    // (k/3)·‖x‖²: scale projected distances by √(3/k) before comparing.
    val rnd = new scala.util.Random(3)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2)))
    val k = 16
    val proj = RandProj.project(vecs.toDF("id", "e"), "id", "e", k, 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    val scale = math.sqrt(3.0 / k)
    val ratios = for {
      i <- 0L until 60L; j <- (i + 1) until 60L
    } yield {
      val orig = dist(vecs(i.toInt)._2.map(_.toDouble),
        vecs(j.toInt)._2.map(_.toDouble))
      dist(proj(i), proj(j)) * scale / orig
    }
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.75 && median < 1.25,
      s"median distortion off: $median")
    // k=16 is a coarse sketch; even the tails must stay sane.
    assert(sorted.head > 0.3 && sorted.last < 2.0,
      s"distortion tails off: ${sorted.head} .. ${sorted.last}")
  }
}
