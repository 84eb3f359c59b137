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

  test("sniffFormat dispatches by magic bytes") {
    val out = binDf((1L, pngHeader), (2L, jpegHeader), (3L, wavHeader),
        (4L, "plain text".getBytes))
      .select(col("id"), Multimodal.sniffFormat(col("payload")).as("fmt"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("png", "jpeg", "wav", "unknown"))
  }
}
