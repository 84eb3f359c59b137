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
}
