package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.Catalog
import graft.header.HeaderDetector
import graft.io.FileReader
import graft.llm.{Decontaminate, Dedup, Index, Multimodal, Pack, SemDedup, Similarity, TextAnalysis, Urls}
import graft.pipeline.Ingestor
import graft.transform.Transformers

import scala.collection.immutable.ListMap

/** Multimodal (image/audio/video) queries.
  *
  * Split from the monolithic Registry (round 13); see [[Registry]] for the
  * registration maps and conventions. */
trait RegistryMm extends RegistryGraph {

  /** Binary-payload metadata through pure expressions (oracle: byte_len). */
  protected def mmMeta(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .select(col("doc_id"), length(col("payload")).cast("long").as("byte_len"))
      .orderBy("doc_id")

  /** Typed Dataset decode path through the REAL javax.imageio kernel: each
    * document manufactures a genuine PNG payload (dims and grayscale fill
    * derived from doc_id), and the partition-local decoder reads back true
    * width/height plus the band-0 pixel sum. The fill rule
    * `pixel(i) = (i + doc_id) mod 256` makes the decoded pixel sum
    * arithmetically predictable, so DuckDB verifies the full
    * encode → decode roundtrip without any codec. */
  protected def mmDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        Multimodal.MediaFile(id, "image", Multimodal.encodePng(w, h, id)) }
    Multimodal.decode(files).toDF()
      .select(col("media_id"), col("width"), col("height"),
        col("feature_hash").as("pixel_sum"))
      .orderBy("media_id")
  }

  /** Per-doc WAV payload for the audio queries: `50 + doc_id mod 100`
    * unsigned-8-bit samples at 8 kHz, sample(i) = (i + doc_id) mod 256 —
    * deterministic, so DuckDB can verify decode output arithmetically. */
  protected def wavFiles(spark: SparkSession, dir: String) = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 100 + 50).cast("int").as("n"))
      .as[(Long, Int)]
      .map { case (id, n) =>
        Multimodal.MediaFile(id, "audio", Multimodal.encodeWav(n, 8000, id)) }
  }

  /** Pure-Column RIFF/WAVE header parse (no decode, no UDF): sample rate,
    * channels, bits, data length, duration — the metadata-only scan shape
    * for 100 TB of audio. */
  protected def mmWavMeta(spark: SparkSession, dir: String): DataFrame =
    wavFiles(spark, dir).toDF()
      .select(col("media_id"), Multimodal.wavMeta(col("payload")).as("m"))
      .select(col("media_id"), col("m.sample_rate"), col("m.channels"),
        col("m.bits"), col("m.data_len"), col("m.duration_ms"))
      .orderBy("media_id")

  /** Typed Dataset decode through the REAL javax.sound.sampled kernel —
    * the audio twin of [[mmDecode]]: true rate/channels/frame-count plus
    * the unsigned sample sum, verified arithmetically by the oracle. */
  protected def mmAudioDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeAudioFiles(wavFiles(spark, dir)).toDF()
      .orderBy("media_id")

  /** REAL decode → nearest-neighbor resize to 8×6 over genuine PNG
    * payloads; integer floor sampling makes the resized pixel sum
    * arithmetically replayable (see [[graft.llm.Multimodal.resizeImage]]).
    * The preprocessing step a vision-model pipeline runs on every image. */
  protected def mmResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        (id, Multimodal.encodePng(w, h, id)) }
      .flatMap { case (id, png) =>
        Multimodal.resizeImage(png, 8, 6).map { case (w2, h2, s) =>
          (id, w2, h2, s) } }
      .toDF("media_id", "width", "height", "pixel_sum")
      .orderBy("media_id")
  }

  /** Perceptual dHash fingerprints over REAL PNG decodes — the image
    * near-dup key (hamming-close dhash ⇒ visually-near-duplicate; the
    * image-side sibling of SimHash): 7×8 row-gradient bits off the
    * genuine imageio raster, packed ≤ 55 bits so the key stays a
    * positive BIGINT on both engines. The oracle rebuilds every bit
    * arithmetically from the synthetic pixel formula. */
  /** Shared (media_id, dhash) relation off real PNG decodes — feeds
    * [[mmDhash]] and [[mmDhashNeardup]]. */
  protected def mmDhashes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) => (id, Multimodal.encodePng(w, h, id)) }
      .flatMap { case (id, png) =>
        Multimodal.dhashImage(png, gw = 7, gh = 8).map(bits => (id, bits)) }
      .toDF("media_id", "dhash")
  }

  /** Audio frame-energy segmentation over REAL WAV decodes — 10-sample
    * frames, per-frame Σ|s−128| energy, first-max argmax; the
    * silence/loudness profile (see
    * [[graft.llm.Multimodal.audioEnergyFrames]]). The oracle rebuilds
    * every frame arithmetically from the synthetic sample formula. */
  protected def mmAudioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 100 + 50).cast("int").as("n"))
      .as[(Long, Int)]
      .map { case (id, n) => (id, Multimodal.encodeWav(n, 8000, id)) }
      .flatMap { case (id, wav) =>
        Multimodal.audioEnergyFrames(wav, frameLen = 10).map {
          case (nf, tot, mx, am) => (id, nf, tot, mx, am) } }
      .toDF("media_id", "n_frames", "total_energy", "max_energy",
        "argmax_frame")
      .orderBy("media_id")
  }

  /** Voice-activity segmentation over REAL WAV decodes — the
    * energy-threshold VAD every speech-corpus pipeline runs before
    * transcription or clipping (Rabiner & Sambur 1975's energy gate,
    * minus the zero-crossing refinement): per-frame energies (the
    * [[graft.llm.Multimodal.audioFrameEnergies]] kernel, 10-sample
    * frames), frames with Σ|s−128| > 700 are active, and consecutive
    * active frames merge into segments via the gaps-and-islands
    * constant-group trick (frame − row_number over active frames).
    * Per clip: frame count, segment count, longest segment, active
    * frames, active ratio ×10⁴. Scale shape: decode is partition-local
    * (no collect), islands use per-clip windows only, one groupBy per
    * grain. The oracle rebuilds every frame arithmetically from the
    * synthetic sample formula and replays the same islands. */
  protected def mmVad(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val thr = 700L
    val frames = t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 100 + 50).cast("int").as("n"))
      .as[(Long, Int)]
      .map { case (id, n) => (id, Multimodal.encodeWav(n, 8000, id)) }
      .flatMap { case (id, wav) =>
        Multimodal.audioFrameEnergies(wav, frameLen = 10).map {
          case (fr, e) => (id, fr, e) } }
      .toDF("media_id", "fr", "e")
    val nf = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"))
    val isl = frames.filter(col("e") > thr)
      .withColumn("grp", col("fr") - row_number().over(
        Window.partitionBy("media_id").orderBy("fr")))
    val seg = isl.groupBy("media_id", "grp")
      .agg(count(lit(1)).as("len"))
    val per = seg.groupBy("media_id")
      .agg(count(lit(1)).as("n_segments"), max(col("len")).as("max_run"),
        sum(col("len")).as("n_active"))
    nf.join(per, Seq("media_id"), "left")
      .select(col("media_id"), col("n_frames"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        coalesce(col("n_active"), lit(0L)).cast("long").as("n_active"),
        expr("coalesce(n_active, 0) * 10000 div n_frames").as("active_bp"))
      .orderBy("media_id")
  }

  /** Perceptual DCT hash over REAL PNG decodes — the frequency-domain
    * sibling of [[mmDhash]] (gradients flip under smoothing; the DCT
    * envelope does not): 8×8 nearest-neighbor resample, fixed-point
    * DCT-II ([[graft.llm.Multimodal.dctTable8]] — the cosine basis is
    * generated once as integer literals shared with the oracle, no
    * float in either data path), 63 AC coefficients thresholded at
    * their value-median. The oracle rebuilds every pixel from the
    * synthetic formula and replays the full integer transform. */
  protected def mmPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) => (id, Multimodal.encodePng(w, h, id)) }
      .flatMap { case (id, png) =>
        Multimodal.phashImage(png).map(bits =>
          (id, bits, java.lang.Long.bitCount(bits).toLong)) }
      .toDF("media_id", "phash", "n_bits")
      .orderBy("media_id")
  }

  /** Generated DuckDB replay for [[mmPhash]]: synthetic pixels, the
    * same integer DCT basis literals, rank-32 median, strict-greater
    * bit pack. */
  protected def phashOracle: String = {
    val t = Multimodal.dctTable8
    val tvals = (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${t(u)(x)})").mkString(", ")
    s"""WITH g AS (SELECT doc_id AS media_id,
           doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h
         FROM documents),
       tv(u, x, c) AS (VALUES $tvals),
       px AS (SELECT media_id, x.i AS x, y.i AS y,
           ((x.i * w // 8) + (y.i * h // 8) * w + media_id) % 256 AS p
         FROM g, range(8) x(i), range(8) y(i)),
       coef AS (SELECT media_id, tu.u AS u, tv2.u AS v,
           CAST(sum(px.p * tu.c * tv2.c) AS BIGINT) AS c
         FROM px JOIN tv tu ON tu.x = px.x JOIN tv tv2 ON tv2.x = px.y
         GROUP BY 1, 2, 3),
       f AS (SELECT media_id, u, v, c, u * 8 + v - 1 AS b
         FROM coef WHERE NOT (u = 0 AND v = 0)),
       med AS (SELECT media_id, c AS m FROM (
           SELECT media_id, c, row_number() OVER (PARTITION BY media_id
             ORDER BY c, b) AS rk
           FROM f)
         WHERE rk = 32)
       SELECT f.media_id,
         CAST(sum(CASE WHEN f.c > med.m
           THEN (CAST(1 AS BIGINT) << f.b) ELSE 0 END) AS BIGINT) AS phash,
         CAST(sum(CASE WHEN f.c > med.m THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bits
       FROM f JOIN med USING (media_id)
       GROUP BY 1 ORDER BY media_id"""
  }

  protected def mmDhash(spark: SparkSession, dir: String): DataFrame =
    mmDhashes(spark, dir)
      .select(col("media_id"), col("dhash"),
        expr("CAST(bit_count(dhash) AS BIGINT)").as("n_bits"))
      .orderBy("media_id")

  /** Image near-duplicate FINGERPRINT pairs end to end: REAL decode →
    * dHash → collapse to distinct fingerprints (exact-dup clusters fall
    * out of the groupBy — on this corpus 500 images share 61 hashes) →
    * band-bucketed candidate join over the DISTINCT-hash relation →
    * exact Hamming verify. Pairing fingerprints instead of images keeps
    * the output |distinct|²-bounded, never corpus²-bounded (the raw
    * image-pair form produced 42k rows from 500 images — quadratic
    * blowup by construction on self-similar corpora). Banding is
    * LOSSLESS by pigeonhole (7 bands of 8 bits, threshold 6 < 7), so
    * the oracle checks the exact answer, not a recall bound. */
  protected def mmDhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    val cl = mmDhashes(spark, dir)
      .groupBy("dhash")
      .agg(count(lit(1)).as("n"), min(col("media_id")).as("rep"))
      .localCheckpoint(true)
    val banded = cl.select(col("dhash"), col("n"), col("rep"),
        explode(array((0 until 7).map(b => struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 8).bitwiseAND(255L).as("key"))): _*))
          .as("bk"))
      .select(col("dhash"), col("n"), col("rep"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key")
          && col("a.dhash") < col("b.dhash"))
      .select(col("a.rep").as("rep_a"), col("b.rep").as("rep_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        col("a.dhash").as("ha"), col("b.dhash").as("hb"))
      .distinct()
      .select(col("rep_a"), col("rep_b"), col("n_a"), col("n_b"),
        expr("CAST(bit_count(ha ^ hb) AS INT)").as("dist"))
      .filter(col("dist") <= 6)
      .orderBy("rep_a", "rep_b")
  }

  /** REAL every-2nd frame sampling over 5-frame synthetic videos
    * (array<binary> of PNGs): modulo filter BEFORE decode, genuine
    * imageio decode per kept frame. */
  protected def mmFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val videos = t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        (id, (0 until 5).map(f => Multimodal.encodePng(w, h, id * 31 + f))) }
      .toDF("media_id", "frames")
    Multimodal.sampleFrames(videos, "media_id", "frames", everyNth = 2)
      .orderBy("media_id", "frame_idx")
  }

  /** Scene-cut detection over the 5-frame synthetic videos — the shot-
    * boundary pass a video-curation pipeline runs before frame sampling
    * (sample per SHOT, not per second): decode EVERY frame for real
    * (everyNth = 1 through the same [[graft.llm.Multimodal.sampleFrames]]
    * kernel), lag the per-frame pixel sums inside each video (5-row
    * windows), flag |Δ| above a threshold. The synthetic pixel ramp
    * (+1 per frame with mod-256 wraps) makes expected deltas exactly
    * computable — the oracle rebuilds every frame sum arithmetically.
    * Integer throughout. */
  protected def mmSceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val videos = t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 1).cast("int").as("w"),
        (col("doc_id") % 12 + 1).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) =>
        (id, (0 until 5).map(f => Multimodal.encodePng(w, h, id * 31 + f))) }
      .toDF("media_id", "frames")
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    Multimodal.sampleFrames(videos, "media_id", "frames", everyNth = 1)
      .withColumn("prev", lag(col("pixel_sum"), 1).over(w))
      .withColumn("delta", abs(col("pixel_sum") - col("prev")))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > 200, 1L).otherwise(0L)).as("n_cuts"),
        max(col("delta")).as("max_delta"))
      .orderBy("media_id")
  }

  /** Audio duplicate detection by LANDMARK FINGERPRINTING (Wang 2003,
    * "An industrial-strength audio search algorithm" — the Shazam
    * constellation: energy peaks become anchor points, nearby peak
    * pairs hash to (e₁, e₂, Δt) landmarks, and a true match is a set of
    * shared landmarks COHERENT at one time offset, scored by offset
    * votes): clips are REAL WAV decodes ([[graft.llm.Multimodal
    * .encodeWavNoise]] synthesizes the md5-noise waveform, the
    * JDK sound stack parses it back), doc_id < 30 get bit-identical
    * twins at +10000 — the planted duplicates the join must find at
    * offset 0. Frames of 10 samples → strict-local-max peaks over 600
    * → fan-out-1 landmarks (each peak pairs with its successor within
    * 8 frames) → hash (e₁·2048 + e₂)·16 + Δt (exact energies: the
    * deterministic-replay variant; production would band e for noise
    * robustness) → hot-hash cap 200 (the minhash maxBucket contract —
    * a boilerplate landmark cannot quadratically blow up the join) →
    * per-(pair, offset) votes, best offset per pair by (votes desc,
    * offset), report pairs with ≥ 3 coherent votes. All integer; the
    * oracle rebuilds every frame energy arithmetically from the sample
    * formula and replays peaks, hashes, cap, and voting. Scale shape:
    * decode is partition-local, peaks/landmarks are per-clip windows,
    * and the only join is hash-bucketed and capped. */
  protected def mmAudioFp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val base = t(spark, dir, "documents")
      .select(col("doc_id").as("media_id"), col("doc_id").as("seed"),
        (col("doc_id") % 300 + 200).cast("int").as("n"))
    // Twins live in the NEGATIVE id space: a +10k id offset collided with
    // real doc ids once the corpus passed 10k docs (caught by the sf1
    // oracle sweep: the oracle's frame GROUP BY then merged two distinct
    // clips while the engine kept duplicate media_id rows with a
    // nondeterministic window tie). -(id+1) cannot collide at any sf.
    val twins = base.filter(col("seed") < 30)
      .select((-(col("media_id") + 1)).as("media_id"), col("seed"),
        col("n"))
    val frames = base.unionByName(twins)
      .as[(Long, Long, Int)]
      .map { case (id, seed, n) =>
        (id, Multimodal.encodeWavNoise(n, 8000, seed)) }
      .flatMap { case (id, wav) =>
        Multimodal.audioFrameEnergies(wav, frameLen = 10).map {
          case (fr, e) => (id, fr, e) } }
      .toDF("media_id", "fr", "e")
    val w = Window.partitionBy("media_id").orderBy("fr")
    val peaks = frames
      .withColumn("ep", lag(col("e"), 1).over(w))
      .withColumn("en", lead(col("e"), 1).over(w))
      .filter(col("e") > 600L
        && (col("ep").isNull || col("e") > col("ep"))
        && (col("en").isNull || col("e") > col("en")))
      .select(col("media_id"), col("fr"), col("e"))
    val marks = peaks
      .withColumn("fr2", lead(col("fr"), 1).over(w))
      .withColumn("e2", lead(col("e"), 1).over(w))
      .filter(col("fr2").isNotNull && col("fr2") - col("fr") <= 8)
      .select(col("media_id"), col("fr").as("t0"),
        expr("(e * 2048 + e2) * 16 + (fr2 - fr)").as("h"))
    val bounded = marks.withColumn("_n",
        count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("_n") <= 200).drop("_n")
    bounded.as("a").join(bounded.as("b"),
        col("a.h") === col("b.h")
          && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("media_a"),
        col("b.media_id").as("media_b"),
        (col("b.t0") - col("a.t0")).as("t_offset"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("media_a", "media_b")
          .orderBy(col("votes").desc, col("t_offset"))))
      .filter(col("rk") === 1 && col("votes") >= 3)
      .select(col("media_a"), col("media_b"), col("t_offset"),
        col("votes"))
      .orderBy("media_a", "media_b")
  }

  protected val mmOracleSql: ListMap[String, String] = ListMap(
    "q_mm_audio_fp" ->
      """WITH clips AS MATERIALIZED (
           SELECT doc_id AS media_id, doc_id AS seed,
                  doc_id % 300 + 200 AS n
           FROM documents
           UNION ALL
           SELECT -(doc_id + 1), doc_id, doc_id % 300 + 200
           FROM documents WHERE doc_id < 30),
         f AS MATERIALIZED (SELECT c.media_id, s.i // 10 AS fr,
             CAST(SUM(abs(('0x' || substr(md5(CAST(c.seed AS VARCHAR) || ':' ||
                 CAST(s.i // 16 AS VARCHAR)), (s.i % 16) * 2 + 1, 2))::BIGINT
                 - 128)) AS BIGINT)
               AS e
           FROM clips c JOIN range(0, 500) s(i) ON s.i < c.n
           GROUP BY 1, 2),
         pk AS MATERIALIZED (SELECT media_id, fr, e FROM (
             SELECT media_id, fr, e,
               lag(e) OVER (PARTITION BY media_id ORDER BY fr) AS ep,
               lead(e) OVER (PARTITION BY media_id ORDER BY fr) AS en
             FROM f)
           WHERE e > 600 AND (ep IS NULL OR e > ep)
             AND (en IS NULL OR e > en)),
         mk AS MATERIALIZED (SELECT media_id, t0,
             (e * 2048 + e2) * 16 + (fr2 - t0) AS h
           FROM (SELECT media_id, fr AS t0, e,
               lead(fr) OVER (PARTITION BY media_id ORDER BY fr) AS fr2,
               lead(e) OVER (PARTITION BY media_id ORDER BY fr) AS e2
             FROM pk)
           WHERE fr2 IS NOT NULL AND fr2 - t0 <= 8),
         bd AS MATERIALIZED (SELECT media_id, t0, h FROM (
             SELECT *, count(*) OVER (PARTITION BY h) AS _n FROM mk)
           WHERE _n <= 200),
         vt AS (SELECT a.media_id AS media_a, b.media_id AS media_b,
             b.t0 - a.t0 AS t_offset, CAST(count(*) AS BIGINT) AS votes
           FROM bd a JOIN bd b
             ON a.h = b.h AND a.media_id < b.media_id
           GROUP BY 1, 2, 3)
         SELECT media_a, media_b, CAST(t_offset AS BIGINT) AS t_offset, votes
         FROM (SELECT *, row_number() OVER (
             PARTITION BY media_a, media_b
             ORDER BY votes DESC, t_offset) AS rk FROM vt)
         WHERE rk = 1 AND votes >= 3
         ORDER BY media_a, media_b""",
    "q_mm_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS byte_len
         FROM documents ORDER BY doc_id""",
    // The engine encodes a real PNG per doc (w = 1 + id%16, h = 1 + id%12,
    // gray pixel i = (i + id) mod 256) and decodes it with javax.imageio;
    // the oracle recomputes the expected dims and pixel sum arithmetically.
    "q_mm_decode" ->
      """SELECT d.doc_id AS media_id,
           CAST(1 + d.doc_id % 16 AS INT) AS width,
           CAST(1 + d.doc_id % 12 AS INT) AS height,
           CAST(SUM((s.i + d.doc_id) % 256) AS BIGINT) AS pixel_sum
         FROM documents d
         JOIN range(0, 192) AS s(i)
           ON s.i < (1 + d.doc_id % 16) * (1 + d.doc_id % 12)
         GROUP BY d.doc_id ORDER BY media_id""",
    // The engine writes a real canonical PCM WAV per doc (n = 50 + id%100
    // 8-bit samples at 8 kHz, sample(i) = (i + id) mod 256); the header
    // parse and the javax.sound decode are both verified arithmetically.
    "q_mm_wav_meta" ->
      """SELECT doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           CAST(8 AS INT) AS bits,
           CAST(50 + doc_id % 100 AS BIGINT) AS data_len,
           CAST(floor((50 + doc_id % 100) * 1000.0 / 8000) AS BIGINT)
             AS duration_ms
         FROM documents ORDER BY media_id""",
    "q_mm_audio_decode" ->
      """SELECT d.doc_id AS media_id,
           CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
           CAST(50 + d.doc_id % 100 AS BIGINT) AS n_samples,
           CAST(SUM((s.i + d.doc_id) % 256) AS BIGINT) AS sample_sum
         FROM documents d
         JOIN range(0, 150) AS s(i) ON s.i < 50 + d.doc_id % 100
         GROUP BY d.doc_id ORDER BY media_id""",
    // The full decode → resize roundtrip verified arithmetically:
    // resized pixel (x, y) samples source (x·w div 8, y·h div 6), whose
    // synthetic value is (sx + sy·w + id) mod 256.
    "q_mm_resize" ->
      """SELECT d.doc_id AS media_id, CAST(8 AS INT) AS width,
           CAST(6 AS INT) AS height,
           CAST(SUM(((x.i * (1 + d.doc_id % 16)) // 8
             + ((y.j * (1 + d.doc_id % 12)) // 6) * (1 + d.doc_id % 16)
             + d.doc_id) % 256) AS BIGINT) AS pixel_sum
         FROM documents d, range(0, 8) x(i), range(0, 6) y(j)
         GROUP BY d.doc_id ORDER BY media_id""",
    // Kept frames f ∈ {0,2,4}; each frame's pixel (x,y) is
    // (x + y·w + id·31 + f) mod 256, summed like q_mm_decode.
    "q_mm_frames" ->
      """SELECT d.doc_id AS media_id, CAST(f.f AS BIGINT) AS frame_idx,
           CAST(1 + d.doc_id % 16 AS INT) AS width,
           CAST(1 + d.doc_id % 12 AS INT) AS height,
           CAST(SUM((s.i + d.doc_id * 31 + f.f) % 256) AS BIGINT)
             AS pixel_sum
         FROM documents d
         JOIN (VALUES (0), (2), (4)) f(f) ON true
         JOIN range(0, 192) AS s(i)
           ON s.i < (1 + d.doc_id % 16) * (1 + d.doc_id % 12)
         GROUP BY d.doc_id, f.f ORDER BY media_id, frame_idx""",
    // dHash replay: pixel(x,y) = (x + y·w + id) mod 256 rebuilt
    // arithmetically; same x·w/outW nearest-neighbor sampling, same
    // (left < right) gradient bits, same ≤55-bit BIGINT packing.
    "q_mm_dhash" ->
      """SELECT d.doc_id AS media_id,
           CAST(SUM(CASE WHEN
               ((((x.i + 1) * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             > (((x.i * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             THEN CAST(1 AS BIGINT) << (y.j * 7 + x.i) ELSE 0 END)
             AS BIGINT) AS dhash,
           CAST(SUM(CASE WHEN
               ((((x.i + 1) * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             > (((x.i * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_bits
         FROM documents d, range(0, 7) x(i), range(0, 8) y(j)
         GROUP BY d.doc_id ORDER BY media_id""",
    // dHash near-dup replay over distinct fingerprints: banding is
    // lossless at threshold 6 < 7 bands, so the oracle checks the EXACT
    // fingerprint-pair Hamming answer.
    "q_mm_dhash_neardup" ->
      """WITH h AS (SELECT d.doc_id AS media_id,
           CAST(SUM(CASE WHEN
               ((((x.i + 1) * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             > (((x.i * (1 + d.doc_id % 16)) // 8
                 + ((y.j * (1 + d.doc_id % 12)) // 8)
                   * (1 + d.doc_id % 16) + d.doc_id) % 256)
             THEN CAST(1 AS BIGINT) << (y.j * 7 + x.i) ELSE 0 END)
             AS BIGINT) AS dhash
         FROM documents d, range(0, 7) x(i), range(0, 8) y(j)
         GROUP BY d.doc_id),
         cl AS (SELECT dhash, CAST(count(*) AS BIGINT) AS n,
                  CAST(min(media_id) AS BIGINT) AS rep
                FROM h GROUP BY 1)
         SELECT a.rep AS rep_a, b.rep AS rep_b, a.n AS n_a, b.n AS n_b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS dist
         FROM cl a JOIN cl b ON a.dhash < b.dhash
         WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         ORDER BY rep_a, rep_b""",
    // Audio-energy replay: same sample formula, same 10-sample frames,
    // first-max argmax as min-frame-with-max.
    "q_mm_audio_energy" ->
      """WITH f AS (SELECT d.doc_id AS media_id, s.i // 10 AS fr,
             CAST(SUM(abs(((s.i + d.doc_id) % 256) - 128)) AS BIGINT) AS e
           FROM documents d
           JOIN range(0, 150) s(i) ON s.i < 50 + d.doc_id % 100
           GROUP BY 1, 2),
         g AS (SELECT media_id, fr, e,
                 max(e) OVER (PARTITION BY media_id) AS me
               FROM f)
         SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(e) AS BIGINT) AS total_energy,
           CAST(max(e) AS BIGINT) AS max_energy,
           CAST(min(CASE WHEN e = me THEN fr END) AS BIGINT)
             AS argmax_frame
         FROM g GROUP BY media_id ORDER BY media_id""",
    // VAD replay: same frame energies as the audio-energy replay, same
    // 700 gate, islands via frame - row_number.
    "q_mm_vad" ->
      """WITH f AS (SELECT d.doc_id AS media_id, s.i // 10 AS fr,
             CAST(SUM(abs(((s.i + d.doc_id) % 256) - 128)) AS BIGINT) AS e
           FROM documents d
           JOIN range(0, 150) s(i) ON s.i < 50 + d.doc_id % 100
           GROUP BY 1, 2),
         nf AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames
           FROM f GROUP BY 1),
         isl AS (SELECT media_id, fr,
             fr - row_number() OVER (PARTITION BY media_id ORDER BY fr)
               AS grp
           FROM f WHERE e > 700),
         seg AS (SELECT media_id, grp, CAST(count(*) AS BIGINT) AS len
           FROM isl GROUP BY 1, 2),
         per AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_segments,
             CAST(max(len) AS BIGINT) AS max_run,
             CAST(sum(len) AS BIGINT) AS n_active
           FROM seg GROUP BY 1)
         SELECT nf.media_id, nf.n_frames,
           coalesce(per.n_segments, 0) AS n_segments,
           coalesce(per.max_run, 0) AS max_run,
           coalesce(per.n_active, 0) AS n_active,
           coalesce(per.n_active, 0) * 10000 // nf.n_frames AS active_bp
         FROM nf LEFT JOIN per USING (media_id) ORDER BY media_id""",
    "q_mm_phash" -> phashOracle,
    // Scene-cut replay: every frame's pixel sum rebuilt arithmetically
    // (the q_mm_frames formula over ALL five frames), same lag deltas.
    "q_mm_scene_cuts" ->
      """WITH fs AS (SELECT d.doc_id AS media_id, f.f AS fr,
             CAST(SUM((s.i + d.doc_id * 31 + f.f) % 256) AS BIGINT) AS ps
           FROM documents d
           JOIN (VALUES (0), (1), (2), (3), (4)) f(f) ON true
           JOIN range(0, 192) AS s(i)
             ON s.i < (1 + d.doc_id % 16) * (1 + d.doc_id % 12)
           GROUP BY 1, 2),
         dl AS (SELECT media_id, fr, ps,
                  abs(ps - lag(ps) OVER (PARTITION BY media_id
                    ORDER BY fr)) AS delta
                FROM fs)
         SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN delta > 200 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cuts,
           CAST(max(delta) AS BIGINT) AS max_delta
         FROM dl GROUP BY media_id ORDER BY media_id""",
  )
}
