package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata; decode/feature steps run as
  * partition-local batch functions.
  *
  * The decode kernel itself is STUBBED (this image ships no codec libs): it
  * is a clearly-marked deterministic fake keyed on the payload bytes, so the
  * Spark-side plumbing — schema, batching, partition shape, null handling —
  * is real and testable, and swapping in a true decoder changes one
  * function. */
object Multimodal {

  /** Typed media row: payload + envelope metadata. */
  final case class MediaFile(media_id: Long, kind: String, payload: Array[Byte])

  /** Decoded (stub) features. */
  final case class MediaMeta(media_id: Long, kind: String, byte_len: Long,
                             width: Int, height: Int, duration_ms: Long,
                             feature_hash: Long)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
  ))

  /** STUB DECODER — deterministic fake in place of a real codec.
    * A production build replaces the body with e.g. javax.imageio /
    * ffmpeg-over-pipe; everything around it (batch iteration, skipping
    * null/empty payloads, output schema) is the real contract. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Long, Long) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
    val width = 1 + math.floorMod(h, 4096).toInt
    val height = 1 + math.floorMod(h >> 12, 4096).toInt
    val durationMs = math.floorMod(h >> 24, 600000L)
    (width, height, durationMs, h)
  }

  /** Partition-local decode: one decoder instance per partition (the real-
    * codec pattern — amortizes native init), rows stream through without
    * collecting. */
  def decode(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    files.mapPartitions { it =>
      it.filter(f => f.payload != null && f.payload.nonEmpty).map { f =>
        val (w, hgt, dur, hash) = decodeStub(f.payload)
        MediaMeta(f.media_id, f.kind, f.payload.length.toLong, w, hgt, dur, hash)
      }
    }
  }

  /** Expression-only variant of the stub metadata (byte length + coarse
    * fake dimensions) for pipelines that stay in pure SQL. */
  def metaColumns(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("width", (pmod(xxhash64(col(payloadCol)), lit(4096L)) + 1L).cast("int"))
      .withColumn("height", (pmod(shiftright(xxhash64(col(payloadCol)), 12), lit(4096L)) + 1L).cast("int"))

  /** REAL (non-stub) image header inspection: PNG IHDR width/height read
    * straight off the binary payload with pure Column ops — signature 8 B +
    * chunk length 4 + "IHDR" 4, so width is the 4-byte big-endian word at
    * offset 16 and height at 20 (PNG spec, public). No UDF, no codec lib,
    * fully codegen'd: the pattern for distributed metadata extraction over
    * 100 TB of images where decoding pixels is not needed. Non-PNG payloads
    * yield null. */
  def pngDims(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def be32(off: Int) =
      conv(hex(substring(payload, off + 1, 4)), 16, 10).cast("long")
    val isPng = hex(substring(payload, 1, 8)) === "89504E470D0A1A0A"
    when(isPng, struct(be32(16).as("width"), be32(20).as("height")))
      .otherwise(lit(null))
  }

  /** Container sniff by magic bytes (PNG / JPEG / GIF / RIFF-WAV / unknown)
    * — the dispatch step in front of any per-format decode. */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head8 = hex(substring(payload, 1, 8))
    val head4 = hex(substring(payload, 1, 4))
    val head3 = hex(substring(payload, 1, 3))
    when(head8 === "89504E470D0A1A0A", "png")
      .when(head3 === "FFD8FF", "jpeg")
      .when(head4 === "47494638", "gif")
      .when(head4 === "52494646" &&
        hex(substring(payload, 9, 4)) === "57415645", "wav")
      .otherwise("unknown")
  }

  /** Frame-sampling plumbing: explode a payload into every-nth-chunk
    * samples, the shape a video frame sampler produces (chunk boundaries
    * stand in for frame boundaries in the stub). */
  def sampleChunks(df: DataFrame, payloadCol: String, chunkBytes: Int, everyNth: Int): DataFrame = {
    val nChunks = ceil(length(col(payloadCol)).cast("double") / chunkBytes).cast("int")
    df.withColumn("chunk_idx",
        explode(filter(sequence(lit(0), nChunks - 1), i => i % everyNth === 0)))
      .withColumn("chunk",
        expr(s"substring($payloadCol, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
  }
}
