package graft

import java.nio.file.Files

import graft.llm.Multimodal

/** Round-14 wave-24 pins: perceptual DCT hash — basis-table sanity, the
  * flat-image zero hash, an independent replay of the full integer
  * transform from the synthetic pixel formula, and invariance of the
  * frequency envelope under brightness shift. */
class PhashSpec extends SparkSpecBase {

  test("fixed-point DCT basis: DC row constant, rows orthogonal-ish") {
    val t = Multimodal.dctTable8
    assert(t(0).forall(_ == 16384L), "u=0 row is the DC row")
    // cos symmetry: T[u][x] = -T[u][7-x] for odd u.
    for (u <- 1 until 8 by 2; x <- 0 until 8)
      assert(t(u)(x) == -t(u)(7 - x), s"odd-u antisymmetry u=$u x=$x")
  }

  test("flat image hashes to zero (no AC energy)") {
    // 1x1 source: every 8x8 sample reads the same pixel.
    val png = Multimodal.encodePng(1, 1, 7L)
    assert(Multimodal.phashImage(png).contains(0L))
  }

  test("q_mm_phash matches an independent replay of the pixel formula") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ph").toString
    val ids = Seq(0L, 1L, 5L, 77L, 200L)
    ids.map(id => (id, s"doc$id")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def replay(id: Long): (Long, Long) = {
      val (w, h) = ((id % 16 + 1).toInt, (id % 12 + 1).toInt)
      val t = Multimodal.dctTable8
      def p(x: Int, y: Int): Long =
        ((x * w / 8) + (y * h / 8).toLong * w + id) % 256
      val coef = Array.tabulate(8, 8) { (u, v) =>
        (for (x <- 0 until 8; y <- 0 until 8)
          yield p(x, y) * t(u)(x) * t(v)(y)).sum
      }
      val ac = for {
        u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0
      } yield (u * 8 + v - 1, coef(u)(v))
      val med = ac.map(_._2).sorted.apply(31)
      val hash = ac.collect { case (b, c) if c > med => 1L << b }.sum
      (hash, java.lang.Long.bitCount(hash).toLong)
    }
    val got = SparkEntry.queries("q_mm_phash")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    ids.foreach { id =>
      assert(got(id) == replay(id), s"phash($id)")
      assert(got(id)._1 >= 0L, "63-bit pack stays positive")
    }
    assert(got.values.exists(_._1 != 0L), "fixture too easy: all-zero hashes")
  }

  test("brightness shift leaves the hash unchanged (DC-only change)") {
    // Same ramp, +64 brightness via the seed: AC coefficients of the
    // wrapped ramp differ ONLY where the mod-256 wrap moves, so pick a
    // small image where no wrap occurs in either variant.
    val a = Multimodal.phashImage(Multimodal.encodePng(4, 3, 10L))
    val b = Multimodal.phashImage(Multimodal.encodePng(4, 3, 74L))
    assert(a.isDefined && a == b,
      "pure-DC brightness shift must not move any AC bit")
  }
}
