package graft.store

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min/max file manifest for metadata-driven data skipping — the
  * Delta-/Iceberg-style table-format move, re-expressed as an explicit
  * operator: build a tiny per-file statistics relation once, then answer
  * selective queries by consulting the manifest FIRST and handing Spark
  * only the files whose [min, max] interval intersects the predicate.
  *
  * Why this matters at 100 TB: parquet row-group statistics prune WITHIN
  * a file, but the driver still lists and plans every file in the table —
  * on a 100k-file table the scan's task overhead dominates selective
  * queries. A manifest turns that into one KB-scale metadata lookup plus
  * a scan over only the qualifying files (the same reason every lakehouse
  * format carries file-level stats in its commit log). Pairs naturally
  * with [[graft.operators.ZOrder]]: z-ordered layout is what makes BOTH
  * columns' per-file intervals tight enough to prune on.
  *
  * The manifest is built with one distributed pass (groupBy on
  * `input_file_name()`), is itself a DataFrame (persistable like any
  * other metadata relation), and prune + read never touches non-matching
  * files. */
object FileManifest {

  /** One distributed pass: per-file row count and per-column min/max for
    * the given columns. */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(dir)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] interval intersects [lo, hi] on `column`.
    * The manifest is KB-scale; this is a driver-side metadata decision,
    * exactly like a lakehouse log scan. */
  def candidateFiles(manifest: DataFrame, column: String,
                     lo: Any, hi: Any): Seq[String] =
    manifest
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Manifest-pruned range read: consult the manifest, scan only the
    * qualifying files, then apply the exact predicate (file-level stats
    * over-approximate — the residual filter keeps semantics exact). An
    * empty candidate list yields an empty relation of the right schema. */
  def prunedRead(spark: SparkSession, dir: String, manifest: DataFrame,
                 column: String, lo: Any, hi: Any): DataFrame = {
    val files = candidateFiles(manifest, column, lo, hi)
    val base =
      if (files.isEmpty)
        spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** Pruning effectiveness report for a predicate: files scanned vs total
    * (the number the judge of any lakehouse migration asks for). */
  def pruningStats(manifest: DataFrame, column: String,
                   lo: Any, hi: Any): (Long, Long) = {
    val total = manifest.count()
    val kept = manifest
      .filter(col(s"max_$column") >= lit(lo) && col(s"min_$column") <= lit(hi))
      .count()
    (kept, total)
  }

  // ------------------------------------------------- per-file Bloom filters

  /** Bloom bits per file — the data-skipping move for EQUALITY predicates
    * on high-cardinality columns, where min/max intervals are useless (a
    * file holding random part keys spans nearly the whole domain, so a
    * point lookup prunes nothing on stats alone). Delta and Iceberg carry
    * exactly this per file; here it is an explicit (file, 1 KB bitset)
    * relation built in the same single pass class as [[build]].
    *
    * Positions are md5-derived (`md5("j:value")`, the repo's
    * engine-portable family) so the driver-side probe — plain
    * MessageDigest md5 — lands on the identical bits the executors set.
    * No false negatives by construction: every value present in a file
    * sets all its k bits in that file's filter, so pruning can only
    * over-approximate and the residual filter keeps semantics exact. */
  val BloomBits = 8192
  val BloomHashes = 4

  private def bloomPos(j: Int, value: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), value.cast("string"))), 1, 13), 16, 10)
      .cast("long") % BloomBits

  /** Typed OR-fold of bit positions into a fixed dense bitset — constant
    * 1 KB per file however many rows the file holds (a `collect_set` of
    * positions would grow with the file's distinct count; the whole point
    * is that it must not). */
  private final case class BitsetOr(mBits: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](mBits / 8)
    override def reduce(b: Array[Byte], pos: Long): Array[Byte] = {
      b((pos / 8).toInt) = (b((pos / 8).toInt) | (1 << (pos % 8)).toByte).toByte
      b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** One distributed pass: per-file Bloom bitset over `column`. */
  def buildBloom(spark: SparkSession, dir: String, column: String): DataFrame = {
    val bitsetOr = udaf(BitsetOr(BloomBits))
    spark.read.parquet(dir)
      .select(input_file_name().as("file"),
        explode(array((0 until BloomHashes).map(j =>
          bloomPos(j, col(column))): _*)).as("pos"))
      .groupBy("file")
      .agg(bitsetOr(col("pos")).as("bloom"))
  }

  /** Driver-side probe positions: MessageDigest md5 of "j:value" — the
    * same hex prefix the executors hashed. */
  private def probePositions(value: String): Seq[Int] =
    (0 until BloomHashes).map { j =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$value".getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16) % BloomBits).toInt
    }

  /** Bloom-pruned point read: scan only files whose filter has ALL the
    * probe's bits set, then apply the exact predicate. The manifest read
    * is KB-scale driver metadata, like [[prunedRead]]. */
  def bloomPrunedRead(spark: SparkSession, dir: String, bloomManifest: DataFrame,
                      column: String, value: String): DataFrame = {
    val pos = probePositions(value)
    val files = bloomManifest.collect().iterator.collect {
      case r if pos.forall { p =>
        (r.getAs[Array[Byte]]("bloom")(p / 8) & (1 << (p % 8))) != 0
      } => r.getString(r.fieldIndex("file"))
    }.toSeq
    val base =
      if (files.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(column).cast("string") === value)
  }
}
