package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns next to typed metadata; decode/feature steps run as
  * partition-local batch functions.
  *
  * The image decode kernel is REAL: JDK `javax.imageio` (no external deps)
  * decodes PNG/JPEG/GIF/BMP payloads to true dimensions and a pixel
  * checksum. Formats the JDK can't read (video, audio) would slot in the
  * same `decodeImage` seam with an external codec. */
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

  /** Encode a real single-band grayscale PNG with pixel (x, y) =
    * `(x + y*width + seed) mod 256`. Used by tests and the registry's
    * decode query to manufacture genuine image payloads whose decoded
    * content is arithmetically predictable (so an external oracle can
    * verify the full encode → decode roundtrip without a codec). */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0,
          java.lang.Math.floorMod(x + y.toLong * width + seed, 256L).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL image decode via JDK javax.imageio: true (width, height,
    * pixel-sum-of-band-0). None if the payload is not a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    Option(img).map { im =>
      val (w, h) = (im.getWidth, im.getHeight)
      val raster = im.getRaster
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum)
    }
  }

  /** Partition-local decode: rows stream through without collecting (the
    * per-partition mapPartitions seam is where a native codec would be
    * initialized once and amortized). Payloads ImageIO cannot decode are
    * dropped — the quarantine-style split belongs to the caller's sniff
    * step. `feature_hash` carries the band-0 pixel sum; `duration_ms` is 0
    * for still images. */
  def decode(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    files.mapPartitions { it =>
      it.filter(f => f.payload != null && f.payload.nonEmpty).flatMap { f =>
        decodeImage(f.payload).map { case (w, hgt, pixSum) =>
          MediaMeta(f.media_id, f.kind, f.payload.length.toLong, w, hgt, 0L, pixSum)
        }
      }
    }
  }

  /** Expression-only metadata for pipelines that stay in pure SQL: real
    * byte length plus true PNG header dimensions (null for other formats —
    * see [[pngDims]]); no pixel decode, no UDF. */
  def metaColumns(df: DataFrame, payloadCol: String): DataFrame =
    df.withColumn("byte_len", length(col(payloadCol)).cast("long"))
      .withColumn("width", pngDims(col(payloadCol)).getField("width").cast("int"))
      .withColumn("height", pngDims(col(payloadCol)).getField("height").cast("int"))

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
