package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width (FWF) text source — the mainframe/legacy-feed cousin of
  * the delimited TXT path (reference sniffs delimiters at
  * file_parser.py:48-style TXT ingest; FWF is the undelimited case no
  * delimiter sniff can catch). Built on `spark.read.text` — splittable,
  * so the scan line-parallelizes at any file size exactly like CSV —
  * with row-local substring slices per column: no shuffle, no UDF,
  * whole-stage-codegen friendly.
  *
  * Contract: columns are (name, 1-based start, width); values
  * right-trim (the standard space padding of FWF feeds); a line too
  * short to reach a column's start yields NULL for that column, and any
  * line shorter than the spec's full extent is flagged `_short_line`
  * (the quarantine predicate — the per-row fallback idiom of
  * S8/ingestor.py). */
object FwfReader {

  def read(spark: SparkSession, path: String,
           cols: Seq[(String, Int, Int)]): DataFrame = {
    require(cols.nonEmpty, "fwf read needs at least one column spec")
    require(cols.forall { case (_, s, w) => s >= 1 && w >= 1 },
      "fwf column starts are 1-based and widths positive")
    val fullExtent = cols.map { case (_, s, w) => s + w - 1 }.max
    val raw = spark.read.text(path)
    cols.foldLeft(raw) { case (df, (name, start, width)) =>
      df.withColumn(name,
        when(length(col("value")) >= start,
          rtrim(substring(col("value"), start, width))))
    }
      .withColumn("_short_line", length(col("value")) < fullExtent)
      .drop("value")
  }
}
