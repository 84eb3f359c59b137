package graft

import graft.llm.Multimodal

/** Round-15 pins for audio landmark fingerprinting (q_mm_audio_fp):
  * the planted bit-identical twins must match at offset 0 through the
  * REAL WAV encode/decode path, and the md5-noise waveform decodes to
  * the documented sample formula. */
class AudioFpSpec extends SparkSpecBase {

  test("encodeWavNoise decodes to the md5 sample formula") {
    val wav = Multimodal.encodeWavNoise(35, 8000, 7L)
    val es = Multimodal.audioFrameEnergies(wav, frameLen = 10)
    assert(es.map(_._1) == Seq(0L, 1L, 2L, 3L),
      "35 samples at frameLen 10 must yield 4 frames incl. partial tail")
    val md = java.security.MessageDigest.getInstance("MD5")
    def sample(i: Int): Long = {
      md.reset()
      val d = md.digest(s"7:${i / 16}".getBytes("US-ASCII"))
      java.lang.Byte.toUnsignedLong(d(i % 16))
    }
    def e(fr: Long, len: Int): Long =
      (0 until len).map(k => math.abs(sample((fr * 10).toInt + k) - 128L))
        .sum
    assert(es == Seq((0L, e(0, 10)), (1L, e(1, 10)), (2L, e(2, 10)),
      (3L, e(3, 5))), "decoded energies must equal the md5 formula")
  }

  test("planted twins match at offset 0; noise admits no pair-mass blowup") {
    val rows = SparkEntry.queries("q_mm_audio_fp")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val twinPairs = rows.filter { case (a, b, _, _) => a == -(b + 1) }
    assert(twinPairs.length == 30,
      s"all 30 planted twins must surface, got ${twinPairs.length}")
    twinPairs.foreach { case (a, b, off, votes) =>
      assert(off == 0L, s"twin ($a,$b) must align at offset 0, got $off")
      assert(votes >= 3L)
    }
    // md5 noise: non-twin coherent collisions must stay a sliver of the
    // corpus, not a quadratic pair mass (the quadratic-fill lesson).
    assert(rows.length - twinPairs.length <= 10,
      s"noise corpus grew ${rows.length - twinPairs.length} non-twin pairs")
    assert(rows.toSeq == rows.toSeq.sorted, "deterministic presentation order")
  }
}
