package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Multimodal

/** Multimodal header inspection: real byte-level parsing (not the decode
  * stub) must read true dimensions from true header bytes. */
class MultimodalSpec extends SparkSpecBase {

  private def binDf(rows: (Long, Array[Byte])*) = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val list = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.foreach { case (id, b) => list.add(org.apache.spark.sql.Row(id, b)) }
    spark.createDataFrame(list, schema)
  }

  private val pngHeader: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0, 0, 0, 0x0D).map(_.toByte) ++                      // IHDR length 13
      "IHDR".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 2, 0x80.toByte,                    // width  640
        0, 0, 1, 0xE0.toByte)                              // height 480

  private val jpegHeader: Array[Byte] =
    Array(0xFF, 0xD8, 0xFF, 0xE0, 0, 0x10).map(_.toByte) ++ "JFIF".getBytes

  private val wavHeader: Array[Byte] =
    "RIFF".getBytes ++ Array[Byte](0x24, 0, 0, 0) ++ "WAVE".getBytes

  test("pngDims reads true width/height from real PNG header bytes") {
    val out = binDf((1L, pngHeader), (2L, jpegHeader), (3L, null))
      .select(col("id"), Multimodal.pngDims(col("payload")).as("dims"))
      .orderBy("id").collect()
    val dims = out(0).getStruct(1)
    assert(dims.getLong(0) == 640L && dims.getLong(1) == 480L)
    assert(out(1).isNullAt(1)) // jpeg -> not a PNG
    assert(out(2).isNullAt(1)) // null payload
  }

  test("encodePng -> decodeImage roundtrips true dims and pixel sum") {
    // 3x2 gray PNG, seed 7: pixels (i + 7) mod 256 for i in 0..5
    val png = Multimodal.encodePng(3, 2, 7L)
    assert(png.take(8).map(_ & 0xff).toSeq ==
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), "not a real PNG")
    val Some((w, h, sum)) = Multimodal.decodeImage(png)
    assert(w == 3 && h == 2)
    assert(sum == (0 until 6).map(i => (i + 7) % 256).sum)
    // wrap-around: a seed near 256 exercises the mod
    val Some((_, _, sum2)) = Multimodal.decodeImage(Multimodal.encodePng(2, 2, 254L))
    assert(sum2 == Seq(254, 255, 0, 1).sum)
  }

  test("decode drops payloads ImageIO cannot read, keeps real images") {
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, "image", Multimodal.encodePng(4, 3, 1L)),
      Multimodal.MediaFile(2L, "image", "not an image".getBytes),
      Multimodal.MediaFile(3L, "image", null),
      Multimodal.MediaFile(4L, "image", Array.empty[Byte])).toDS()
    val out = Multimodal.decode(files).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L))
    assert(out.head.width == 4 && out.head.height == 3 && out.head.duration_ms == 0L)
    assert(out.head.feature_hash == (0 until 12).map(i => (i + 1) % 256).sum)
  }

  test("decode refuses a decompression-bomb header instead of allocating") {
    // A REAL PNG whose IHDR declares 60000x60000 (~3.6 G pixels): the
    // header parses fine, so only the declared-dims guard stands between
    // the reader and a giant BufferedImage allocation.
    val png = Multimodal.encodePng(4, 3, 1L)
    val bomb = png.clone()
    def put(off: Int, v: Int): Unit = {
      bomb(off) = ((v >> 24) & 0xff).toByte; bomb(off + 1) = ((v >> 16) & 0xff).toByte
      bomb(off + 2) = ((v >> 8) & 0xff).toByte; bomb(off + 3) = (v & 0xff).toByte
    }
    put(16, 60000); put(20, 60000) // IHDR width/height fields
    assert(Multimodal.decodeImage(bomb).isEmpty)
    assert(Multimodal.decodeImage(png).isDefined) // guard passes real images
  }

  test("encodeWav -> decodeAudio roundtrips rate, channels, frames, sum") {
    // 6 samples at 8 kHz, seed 5: samples (i + 5) mod 256 for i in 0..5
    val wav = Multimodal.encodeWav(6, 8000, 5L)
    assert(wav.length == 44 + 6)
    val Some((rate, ch, frames, sum)) = Multimodal.decodeAudio(wav)
    assert(rate == 8000 && ch == 1 && frames == 6L)
    assert(sum == (0 until 6).map(i => (i + 5) % 256).sum)
    // wrap-around: seed near 256 exercises the mod
    val Some((_, _, _, sum2)) = Multimodal.decodeAudio(Multimodal.encodeWav(4, 8000, 254L))
    assert(sum2 == Seq(254, 255, 0, 1).sum)
    // non-audio payloads are None, not errors
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
  }

  test("audioEnergyFrames quarantines a zero-sample stream (None, " +
      "never -1 sentinels)") {
    assert(Multimodal.audioEnergyFrames(
      Multimodal.encodeWav(0, 8000, 0L), frameLen = 10).isEmpty)
    // One sample still yields a real (partial-tail) frame profile.
    assert(Multimodal.audioEnergyFrames(
      Multimodal.encodeWav(1, 8000, 128L), frameLen = 10)
      .contains((1L, 0L, 0L, 0L)))
  }

  test("decodeAudioFiles drops undecodable payloads, keeps real audio") {
    import spark.implicits._
    val files = Seq(
      Multimodal.MediaFile(1L, "audio", Multimodal.encodeWav(10, 16000, 3L)),
      Multimodal.MediaFile(2L, "audio", "static noise".getBytes),
      Multimodal.MediaFile(3L, "audio", null)).toDS()
    val out = Multimodal.decodeAudioFiles(files).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L))
    assert(out.head.sample_rate == 16000 && out.head.channels == 1 &&
      out.head.n_samples == 10L)
    assert(out.head.sample_sum == (0 until 10).map(i => (i + 3) % 256).sum)
  }

  test("wavMeta reads the same header fields the JDK decoder reports") {
    val wav = Multimodal.encodeWav(4000, 8000, 0L)
    val out = binDf((1L, wav), (2L, pngHeader), (3L, null))
      .select(col("id"), Multimodal.wavMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    val m = out(0).getStruct(1)
    assert(m.getInt(0) == 8000 && m.getInt(1) == 1 && m.getInt(2) == 8)
    assert(m.getLong(3) == 4000L)      // data_len
    assert(m.getLong(4) == 500L)       // 4000 B / 8000 B·s⁻¹ = 500 ms
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("sniffFormat dispatches by magic bytes") {
    val out = binDf((1L, pngHeader), (2L, jpegHeader), (3L, wavHeader),
        (4L, "plain text".getBytes))
      .select(col("id"), Multimodal.sniffFormat(col("payload")).as("fmt"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("png", "jpeg", "wav", "unknown"))
  }

  test("resizeImage samples nearest-neighbor with integer floor indices") {
    // 4×2 image, pixel (x, y) = x + 4y (seed 0); resize to 2×1 samples
    // source pixels (0,0) and (2,0) → sum 0 + 2 = 2.
    val png = Multimodal.encodePng(4, 2, 0L)
    assert(Multimodal.resizeImage(png, 2, 1).contains((2, 1, 2L)))
    // identity resize reproduces the full pixel sum
    val full = Multimodal.decodeImage(png).get._3
    assert(Multimodal.resizeImage(png, 4, 2).contains((4, 2, full)))
    // undecodable payload drops, not throws
    assert(Multimodal.resizeImage("junk".getBytes, 2, 2).isEmpty)
  }

  test("sampleFrames keeps every nth frame and decodes only those") {
    import spark.implicits._
    val frames = (0 until 5).map(f => Multimodal.encodePng(3, 3, f.toLong))
    val bad = frames.updated(1, "broken".getBytes) // dropped if ever decoded
    val df = Seq((7L, bad)).toDF("media_id", "frames")
    val out = Multimodal.sampleFrames(df, "media_id", "frames", everyNth = 2)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L))
    val expected = (f: Long) => (0 until 9).map(i => (i + f) % 256).sum
    assert(out.map(_.getLong(4)).toSeq ==
      Seq(expected(0L), expected(2L), expected(4L)))
  }
}
