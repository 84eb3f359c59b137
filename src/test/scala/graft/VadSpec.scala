package graft

import java.nio.file.Files

import graft.llm.Multimodal

/** Round-14 wave-14 pins: energy-gate voice-activity detection — the
  * frame-energy kernel against a hand WAV, and the registered query's
  * islands against an independent arithmetic replay of the synthetic
  * sample formula. */
class VadSpec extends SparkSpecBase {

  test("audioFrameEnergies: 25 samples at frameLen 10 -> 2 full + 1 tail frame") {
    // encodeWav(seed = 0): sample i = i, energy |i - 128|.
    val wav = Multimodal.encodeWav(25, 8000, 0L)
    val got = Multimodal.audioFrameEnergies(wav, frameLen = 10)
    def e(lo: Int, hi: Int) = (lo until hi).map(i => math.abs(i - 128)).sum.toLong
    assert(got == Seq((0L, e(0, 10)), (1L, e(10, 20)), (2L, e(20, 25))))
  }

  test("audioFrameEnergies: garbage payload decodes to empty, not a crash") {
    assert(Multimodal.audioFrameEnergies(Array[Byte](1, 2, 3), 10).isEmpty)
  }

  test("q_mm_vad matches an independent replay of the sample formula") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-vad").toString
    val ids = Seq(0L, 1L, 2L, 77L, 133L)
    ids.map(id => (id, s"doc$id")).toDF("doc_id", "text")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // Independent replay: sample i of clip id is (i + id) % 256, frame
    // energy is the 10-sample sum of |s - 128|, active gate > 700,
    // islands = maximal runs of consecutive active frames.
    val expected = ids.map { id =>
      val n = (id % 100 + 50).toInt
      val energies = (0 until n).grouped(10).map(_.map(i =>
        math.abs(((i + id) % 256) - 128)).sum).toSeq
      val active = energies.map(_ > 700L)
      val runs = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = 0L
      active.foreach { a =>
        if (a) cur += 1
        else if (cur > 0) { runs += cur; cur = 0 }
      }
      if (cur > 0) runs += cur
      val nAct = runs.sum
      id -> ((energies.size.toLong, runs.size.toLong,
        if (runs.isEmpty) 0L else runs.max, nAct,
        nAct * 10000L / energies.size))
    }.toMap
    val got = SparkEntry.queries("q_mm_vad")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, exp) =>
      assert(got(id) == exp, s"clip $id: got ${got(id)}, want $exp")
    }
    // The gate must actually discriminate on this corpus: at least one
    // clip with both active and silent frames.
    assert(expected.values.exists(v => v._4 > 0 && v._4 < v._1),
      "corpus too easy: every clip is all-active or all-silent")
  }
}
