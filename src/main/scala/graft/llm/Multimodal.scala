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

  // ImageIO's default ImageInput/OutputStream cache is a TEMP FILE per
  // encode/decode call — for KB-scale in-memory payloads that is one disk
  // round-trip per image and dominates the kernel (~10× on tiny frames).
  // Executors touch this object before any codec call, so the JVM-wide
  // switch applies wherever the kernels run.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Maximum pixels a payload may declare before we refuse to allocate the
    * BufferedImage (decompression-bomb guard: a 40-byte crafted header can
    * declare 60000×60000 and OOM the executor before any decode error). */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** REAL image decode via JDK javax.imageio: true (width, height,
    * pixel-sum-of-band-0). None if the payload is not a decodable image —
    * including payloads that make an imageio plugin throw a RuntimeException
    * (malformed headers trigger IllegalArgument/IndexOutOfBounds in plugin
    * parsers, not just IOException; a quarantine-style kernel must drop
    * those rows, not abort the job) and payloads whose DECLARED dimensions
    * exceed [[MaxDecodePixels]] (checked from the header, before
    * allocation). */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      // createImageInputStream defaults to a FileCacheImageInputStream
      // (open temp file + fd); it must close on EVERY exit path — early
      // returns included — or a corpus-scale decode leaks one fd per row.
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
          val im = reader.read(0)
          val raster = im.getRaster
          var sum = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          Some((w, h, sum))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

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

  /** Decoded audio features (see [[decodeAudio]]). */
  final case class AudioMeta(media_id: Long, sample_rate: Int, channels: Int,
                             n_samples: Long, sample_sum: Long)

  /** Encode a real canonical PCM WAV (44-byte RIFF header + 8-bit unsigned
    * mono samples) with sample(i) = `(i + seed) mod 256`. Like [[encodePng]],
    * the deterministic fill makes the decoded sample sum arithmetically
    * predictable, so an external oracle can verify the encode → decode
    * roundtrip without an audio library. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)              // PCM
      .putShort(1.toShort)              // mono
      .putInt(sampleRate)
      .putInt(sampleRate)               // byte rate = rate × 1 ch × 1 B
      .putShort(1.toShort)              // block align
      .putShort(8.toShort)              // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    var i = 0
    while (i < nSamples) {
      out.put(java.lang.Math.floorMod(i + seed, 256L).toByte)
      i += 1
    }
    out.array()
  }

  /** [[encodeWav]] sibling with a PSEUDO-RANDOM deterministic
    * waveform: sample i is byte (i mod 16) of md5("<seed>:<i div 16>") —
    * the same engine-replayable md5 grain every hash-derived oracle in
    * the registry uses. The linear ramp [[encodeWav]] emits is
    * shift-invariant across seeds, and any LOW-DEGREE polynomial mod
    * 256 keeps period-128 structure (measured: a quadratic fill made
    * clips sharing one coefficient match at offsets ±13/±26, growing
    * the landmark pair mass ~quadratically); md5 noise has neither —
    * clips collide only when the seed matches, so fingerprint matches
    * are exactly the planted twins plus vanishing chance collisions.
    * Same real 8-bit-unsigned mono PCM container — the decode path
    * stays the true `javax.sound.sampled` parse. */
  def encodeWavNoise(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + nSamples)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort)
      .putShort(1.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate)
      .putShort(1.toShort)
      .putShort(8.toShort)
      .put("data".getBytes("US-ASCII")).putInt(nSamples)
    val md = java.security.MessageDigest.getInstance("MD5")
    var digest: Array[Byte] = null
    var i = 0
    while (i < nSamples) {
      if (i % 16 == 0 || digest == null) {
        md.reset()
        digest = md.digest((seed.toString + ":" + (i / 16)).getBytes("US-ASCII"))
      }
      out.put(digest(i % 16))
      i += 1
    }
    out.array()
  }

  /** REAL audio decode via JDK `javax.sound.sampled` (headless-safe: file
    * parsing needs no audio device): true (sampleRate, channels, frame
    * count, sum of unsigned 8-bit samples). None if the payload is not a
    * decodable audio container. */
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        var sum = 0L
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) { sum += java.lang.Byte.toUnsignedInt(buf(i)); i += 1 }
          n = in.read(buf)
        }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, frames, sum))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** The energy kernels' stated contract: |s − 128| per byte is only
    * meaningful for 8-bit UNSIGNED PCM (the canonical WAV grain
    * [[encodeWav]] emits). A 16-bit or signed-PCM payload decodes
    * successfully but byte-wise |s − 128| is noise — quarantine it
    * instead of skewing downstream energy gates (e.g. the VAD's 700). */
  private def isUnsigned8BitPcm(fmt: javax.sound.sampled.AudioFormat): Boolean =
    fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED &&
      fmt.getSampleSizeInBits == 8

  /** Frame-energy profile off a REAL audio decode — the
    * silence-detection / loudness-segmentation kernel an audio-corpus
    * pass runs before clipping or captioning: stream the decoded 8-bit
    * samples once, accumulate per-frame energy Σ|s − 128|, and report
    * (n_frames incl. the partial tail, total_energy, max_energy,
    * argmax_frame — FIRST frame on ties, the deterministic tie-break the
    * oracle mirrors as min-frame-with-max). None on undecodable,
    * zero-sample, or non-8-bit-unsigned-PCM payloads, quarantine-style —
    * never -1 sentinels. */
  def audioEnergyFrames(payload: Array[Byte],
                        frameLen: Int): Option[(Long, Long, Long, Long)] = {
    require(frameLen >= 1)
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        if (!isUnsigned8BitPcm(in.getFormat)) return None
        var frame = 0L; var inFrame = 0; var e = 0L
        var total = 0L; var maxE = -1L; var argmax = -1L; var nFrames = 0L
        def closeFrame(): Unit = {
          nFrames += 1; total += e
          if (e > maxE) { maxE = e; argmax = frame }
          frame += 1; inFrame = 0; e = 0
        }
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            e += math.abs(java.lang.Byte.toUnsignedInt(buf(i)) - 128)
            inFrame += 1
            if (inFrame == frameLen) closeFrame()
            i += 1
          }
          n = in.read(buf)
        }
        if (inFrame > 0) closeFrame()
        if (nFrames == 0) None // zero-sample stream: quarantine, no sentinels
        else Some((nFrames, total, maxE, argmax))
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }
  }

  /** Per-frame energy SEQUENCE off a REAL audio decode — the frame-grain
    * sibling of [[audioEnergyFrames]] feeding voice-activity
    * segmentation: (frame index, Σ|s − 128|) for every frame including
    * the partial tail. Empty on undecodable, zero-sample, or
    * non-8-bit-unsigned-PCM payloads. */
  def audioFrameEnergies(payload: Array[Byte],
                         frameLen: Int): Seq[(Long, Long)] = {
    require(frameLen >= 1)
    import javax.sound.sampled.AudioSystem
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        if (!isUnsigned8BitPcm(in.getFormat)) return Seq.empty
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var frame = 0L; var inFrame = 0; var e = 0L
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) {
          var i = 0
          while (i < n) {
            e += math.abs(java.lang.Byte.toUnsignedInt(buf(i)) - 128)
            inFrame += 1
            if (inFrame == frameLen) {
              out += ((frame, e)); frame += 1; inFrame = 0; e = 0
            }
            i += 1
          }
          n = in.read(buf)
        }
        if (inFrame > 0) out += ((frame, e))
        out.toSeq
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => Seq.empty
      case _: java.io.IOException => Seq.empty
    }
  }

  /** Partition-local audio decode, the audio twin of [[decode]]: payloads
    * the JDK cannot parse are dropped, everything else streams through
    * without collecting. */
  def decodeAudioFiles(files: Dataset[MediaFile]): Dataset[AudioMeta] = {
    implicit val enc = Encoders.product[AudioMeta]
    files.mapPartitions { it =>
      it.filter(f => f.payload != null && f.payload.nonEmpty).flatMap { f =>
        decodeAudio(f.payload).map { case (rate, ch, frames, sum) =>
          AudioMeta(f.media_id, rate, ch, frames, sum)
        }
      }
    }
  }

  /** REAL (non-stub) WAV header inspection with pure Column ops — the audio
    * twin of [[pngDims]]: RIFF/WAVE is little-endian, so each field is the
    * byte-reversed hex word at its canonical-header offset (RIFF spec,
    * public). Yields struct(sample_rate, channels, bits, data_len,
    * duration_ms) for canonical 44-byte-header PCM payloads, null
    * otherwise. Fully codegen'd — the shape for metadata extraction over
    * 100 TB of audio where decoding samples is not needed. */
  def wavMeta(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // Little-endian uint at 1-based byte offset `off`, width `n` bytes.
    def le(off: Int, n: Int) =
      conv(concat((0 until n).reverse.map(i =>
        hex(substring(payload, off + i, 1))): _*), 16, 10).cast("long")
    val isWav = hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 8)) === "57415645666D7420"
    val byteRate = le(29, 4)
    val dataLen = le(41, 4)
    when(isWav, struct(
      le(25, 4).cast("int").as("sample_rate"),
      le(23, 2).cast("int").as("channels"),
      le(35, 2).cast("int").as("bits"),
      dataLen.as("data_len"),
      floor(dataLen * 1000L / byteRate).cast("long").as("duration_ms")))
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

  /** REAL nearest-neighbor image resize via the decoded raster: source
    * pixel for output (x, y) is (x·w div outW, y·h div outH) — exact
    * integer floor sampling, so on the synthetic corpus an external
    * oracle replays the resized pixel sum arithmetically. Returns
    * (outW, outH, pixel-sum-of-band-0 of the RESIZED image); None on
    * undecodable payloads (same quarantine contract as [[decodeImage]],
    * same decompression-bomb guard, same fd hygiene). */
  def resizeImage(payload: Array[Byte], outW: Int,
                  outH: Int): Option[(Int, Int, Long)] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
          val raster = reader.read(0).getRaster
          var sum = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              sum += raster.getSample(x * w / outW, sy, 0)
              x += 1
            }
            y += 1
          }
          Some((outW, outH, sum))
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fixed-point 8-point DCT-II basis, T[u][x] = round(cos((2x+1)uπ/16)
    * · 2¹⁴): generated ONCE here and injected as integer literals into
    * both the Scala kernel and the SQL oracle, so no transcendental is
    * ever evaluated in either engine's data path. */
  private[graft] lazy val dctTable8: Array[Array[Long]] =
    Array.tabulate(8, 8) { (u, x) =>
      Math.round(math.cos((2 * x + 1) * u * math.Pi / 16) * 16384.0)
    }

  /** Perceptual pHash (the DCT hash of the pHash/ImageHash family —
    * dHash sees local gradients, this sees the global frequency
    * envelope, so it survives smoothing and small shifts that flip
    * gradient bits): nearest-neighbor resample the REAL decoded raster
    * to 8×8 (the [[resizeImage]] x·w div 8 rule), 2-D fixed-point
    * DCT-II via [[dctTable8]] (coefficients fit long: 255·64·2²⁸), drop
    * the DC term, threshold the 63 AC coefficients at their median
    * (value-based — the 32nd smallest — so tie order cannot matter),
    * pack strict-greater bits at position u·8+v−1. 63 bits ⇒ always a
    * positive long. None on undecodable payloads, quarantine-style. */
  def phashImage(payload: Array[Byte]): Option[Long] = {
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
          val raster = reader.read(0).getRaster
          val p = Array.tabulate(8, 8)((x, y) =>
            raster.getSample(x * w / 8, y * h / 8, 0).toLong)
          val t = dctTable8
          val coef = Array.tabulate(8, 8) { (u, v) =>
            var s = 0L
            var x = 0
            while (x < 8) {
              var y = 0
              while (y < 8) { s += p(x)(y) * t(u)(x) * t(v)(y); y += 1 }
              x += 1
            }
            s
          }
          val ac = for {
            u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0
          } yield (u * 8 + v - 1, coef(u)(v))
          val med = ac.map(_._2).sorted.apply(31)
          Some(ac.collect { case (b, c) if c > med => 1L << b }.sum)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Difference-hash perceptual fingerprint (dHash — the standard
    * near-duplicate key for images; Krawetz's 2013 popularization of the
    * row-gradient hash): nearest-neighbor resample the REAL decoded
    * raster to a (gw+1)×gh grid with the same x·w/outW sampling rule as
    * [[resizeImage]], then one bit per horizontally adjacent pair
    * (left < right). gw·gh must stay ≤ 62 so the packed key is a
    * positive long on every engine (the oracle rebuilds it with BIGINT
    * shifts). None on undecodable payloads, quarantine-style. */
  def dhashImage(payload: Array[Byte], gw: Int, gh: Int): Option[Long] = {
    require(gw >= 1 && gh >= 1 && gw * gh <= 62, "dhash needs gw*gh <= 62")
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0))
          if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) return None
          val raster = reader.read(0).getRaster
          var bits = 0L
          var y = 0
          while (y < gh) {
            val sy = y * h / gh
            var x = 0
            while (x < gw) {
              val a = raster.getSample(x * w / (gw + 1), sy, 0)
              val b = raster.getSample((x + 1) * w / (gw + 1), sy, 0)
              if (b > a) bits |= 1L << (y * gw + x)
              x += 1
            }
            y += 1
          }
          Some(bits)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Per-frame decoded metadata row. */
  final case class FrameMeta(media_id: Long, frame_idx: Long, width: Int,
                             height: Int, pixel_sum: Long)

  /** REAL every-nth frame sampling over an array-of-frames column (the
    * video shape: one row per media, frames as an `array<binary>`):
    * posexplode → modulo filter BEFORE any decode (the sampler's whole
    * point — decode cost scales with frames KEPT, not frames stored),
    * then the genuine imageio decode per surviving frame. Undecodable
    * frames drop, quarantine-style. */
  def sampleFrames(df: DataFrame, idCol: String, framesCol: String,
                   everyNth: Int): DataFrame = {
    require(everyNth >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        posexplode(col(framesCol)).as(Seq("frame_idx", "payload")))
      .filter(pmod(col("frame_idx"), lit(everyNth)) === 0)
      .as[(Long, Int, Array[Byte])]
      .flatMap { case (id, idx, p) =>
        decodeImage(p).map { case (w, h, s) =>
          FrameMeta(id, idx.toLong, w, h, s)
        }
      }
      .toDF()
  }
}
