package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus reader — deliberately beyond the reference's format set
  * (its upload dispatch rejects anything but csv/xlsx/xls/txt,
  * app/routers/upload.py + app/services/file_parser.py:32-70), added
  * because training corpora overwhelmingly arrive as JSON Lines.
  *
  * Spark's native json source parses distributed — Jackson per partition,
  * `multiLine=false` so the input splits by LINE and a 100 TB corpus fans
  * out across every executor (a multiLine json file would pin each file to
  * one task). Callers that know the shape pass an explicit schema and skip
  * the inference pre-pass entirely — at scale, inference is a full extra
  * read. PERMISSIVE mode keeps malformed lines as null rows (optionally
  * captured via a `_corrupt` schema column) instead of failing the job,
  * matching the engine's quarantine-not-crash ingest philosophy. */
object JsonlReader {

  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val reader = spark.read
      .option("multiLine", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
    schema.fold(reader)(reader.schema).json(path)
  }
}
