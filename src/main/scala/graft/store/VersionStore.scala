package graft.store

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.Catalog

/** Versioned relational store over parquet.
  *
  * Layout: `root/data/<table>/data_version_id=<id>/…parquet` (hive-style
  * partitioning so version predicates prune at the FILE level — a "current
  * version" read of a 100 TB table touches only that version's files), plus
  * small metadata parquet tables `root/meta/{data_versions,parts,logs}`.
  *
  * Reference semantics: scripts/init_db.py:36-155 (metadata schema),
  * app/services/ingestor.py:101-259 (lifecycle), 691-783 (multi-part append),
  * scripts/init_db.py:418-518 (current views).
  *
  * Atomicity (U3): metadata updates are write-new-then-rename swaps of the
  * versions table — the same observable contract as the reference's DB
  * transaction, under a single-writer discipline.
  */
final class VersionStore(val spark: SparkSession, val root: String) {
  import VersionStore._

  private val metaDir = s"$root/meta"
  private val dataDir = s"$root/data"

  def versionsPath: String = s"$metaDir/data_versions"
  def partsPath: String = s"$metaDir/data_version_parts"
  def logsPath: String = s"$metaDir/ingestion_logs"

  private def exists(p: String): Boolean = Files.exists(Paths.get(p))

  /** Versions metadata DF (empty-shaped if none yet). */
  def versions: DataFrame =
    if (exists(versionsPath)) spark.read.parquet(versionsPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], versionSchema)

  def parts: DataFrame =
    if (exists(partsPath)) spark.read.parquet(partsPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], partSchema)

  def logs: DataFrame =
    if (exists(logsPath)) spark.read.parquet(logsPath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], logSchema)

  /** Atomic swap: write to a temp dir, then rename over the live one. */
  private def swapWrite(df: DataFrame, path: String): Unit = {
    val tmp = path + ".tmp"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val live = Paths.get(path)
    val old = Paths.get(path + ".old")
    if (Files.exists(live)) {
      deleteRecursively(old)
      Files.move(live, old, StandardCopyOption.ATOMIC_MOVE)
    }
    Files.move(Paths.get(tmp), live, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** U2 create a version in 'processing' state; returns its id. */
  def createVersion(sourceCode: String, versionLabel: String,
                    effectiveDate: java.sql.Date, variant: Option[String],
                    fileHash: String, fileName: String): Long = {
    val cur = versions
    val nextId = if (cur.isEmpty) 1L
      else cur.agg(max("data_version_id")).head.getLong(0) + 1L
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        nextId, sourceCode, versionLabel, effectiveDate, variant.orNull,
        "processing", fileHash, fileName, null, false, now, 1, null)),
      versionSchema)
    swapWrite(cur.unionByName(row), versionsPath)
    nextId
  }

  /** U2 transition: completed (+record_count) or failed (+error). When
    * `markCurrentFor` is set, the U3 current-swap happens in the SAME
    * metadata swap — one atomic transition, like the reference's single DB
    * transaction (and one fewer metadata write per ingest). */
  def completeVersion(id: Long, recordCount: Long,
                      markCurrentFor: Option[(String, Option[String])] = None): Unit =
    updateVersion(id, v => {
      val completed = v
        .withColumn("status", when(col("data_version_id") === id, "completed").otherwise(col("status")))
        .withColumn("record_count", when(col("data_version_id") === id, recordCount).otherwise(col("record_count")))
      markCurrentFor match {
        case Some((sourceCode, variant)) =>
          val scope = col("source_code") === sourceCode &&
            (col("variant") <=> lit(variant.orNull))
          completed.withColumn("is_current",
            when(col("data_version_id") === id, true)
              .when(scope, false)
              .otherwise(col("is_current")))
        case None => completed
      }
    })

  def failVersion(id: Long, error: String): Unit = updateVersion(id,
    _.withColumn("status", when(col("data_version_id") === id, "failed").otherwise(col("status")))
      .withColumn("error_message", when(col("data_version_id") === id, error).otherwise(col("error_message"))))

  private def updateVersion(id: Long, f: DataFrame => DataFrame): Unit =
    swapWrite(f(versions), versionsPath)

  /** U3 mark-as-current: one swap clears is_current for the (source,
    * variant) scope and sets it on the new version — null-safe variant
    * compare, like the reference's `IS NOT DISTINCT FROM` (ingestor.py:226-259). */
  def markCurrent(id: Long, sourceCode: String, variant: Option[String]): Unit = {
    val scope = col("source_code") === sourceCode &&
      (col("variant") <=> lit(variant.orNull))
    updateVersion(id, v =>
      v.withColumn("is_current",
        when(col("data_version_id") === id, true)
          .when(scope, false)
          .otherwise(col("is_current"))))
  }

  /** Write a version's data partition (U4 append mode for multi-part). */
  def writeData(table: String, versionId: Long, df: DataFrame, append: Boolean = false): Unit = {
    df.withColumn("data_version_id", lit(versionId))
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .partitionBy("data_version_id")
      .parquet(s"$dataDir/$table")
  }

  def data(table: String): DataFrame = spark.read.parquet(s"$dataDir/$table")

  /** J2 current view: data ⋈ broadcast(current version ids). The metadata
    * side is tiny, so Catalyst broadcasts it and partition pruning on
    * data_version_id keeps the scan to current files only. */
  def currentView(table: String, sourceCode: String, variant: Option[String] = None): DataFrame = {
    val cur = versions.filter(
      col("source_code") === sourceCode && col("is_current") === true &&
        col("status") === "completed" && (col("variant") <=> lit(variant.orNull)))
      .select("data_version_id")
    data(table).join(broadcast(cur), Seq("data_version_id"))
  }

  /** U5 cascade delete: version data files + metadata rows. */
  def deleteVersion(id: Long, table: String): Unit = {
    deleteRecursively(Paths.get(s"$dataDir/$table/data_version_id=$id"))
    swapWrite(versions.filter(col("data_version_id") =!= id), versionsPath)
    if (exists(partsPath))
      swapWrite(parts.filter(col("data_version_id") =!= id), partsPath)
  }

  /** U4 part bookkeeping: add a part row and bump the version's counters
    * (record_count += n, part_count += 1 — reference ingestor.py:153-195). */
  def appendPart(versionId: Long, partNumber: Int, fileHash: String,
                 fileName: String, recordCount: Long): Unit = {
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        versionId, partNumber, fileHash, fileName, recordCount)), partSchema)
    swapWrite(parts.unionByName(row), partsPath)
    updateVersion(versionId, v => v
      .withColumn("record_count", when(col("data_version_id") === versionId,
        coalesce(col("record_count"), lit(0L)) + recordCount).otherwise(col("record_count")))
      .withColumn("part_count", when(col("data_version_id") === versionId,
        coalesce(col("part_count"), lit(1)) + 1).otherwise(col("part_count"))))
  }

  /** U6 ingestion event log append. */
  def log(versionId: Long, level: String, message: String, detailsJson: Option[String] = None): Unit = {
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(versionId, level, message,
        detailsJson.orNull, now)), logSchema)
    row.write.mode(SaveMode.Append).parquet(logsPath)
  }

  /** D2 duplicate-file detection: any completed version of this source with
    * the same hash blocks re-upload (reference: validator.py:178-214). */
  def isDuplicateFile(sourceCode: String, fileHash: String): Boolean =
    !versions.filter(col("source_code") === sourceCode &&
      col("file_hash") === fileHash && col("status") === "completed").isEmpty
}

object VersionStore {
  import org.apache.spark.sql.types._

  val versionSchema: StructType = StructType(Seq(
    StructField("data_version_id", LongType, nullable = false),
    StructField("source_code", StringType, nullable = false),
    StructField("version_label", StringType, nullable = false),
    StructField("effective_date", DateType, nullable = true),
    StructField("variant", StringType, nullable = true),
    StructField("status", StringType, nullable = false),
    StructField("file_hash", StringType, nullable = true),
    StructField("file_name", StringType, nullable = true),
    StructField("record_count", LongType, nullable = true),
    StructField("is_current", BooleanType, nullable = false),
    StructField("imported_at", TimestampType, nullable = false),
    StructField("part_count", IntegerType, nullable = true),
    StructField("error_message", StringType, nullable = true),
  ))

  val partSchema: StructType = StructType(Seq(
    StructField("data_version_id", LongType, nullable = false),
    StructField("part_number", IntegerType, nullable = false),
    StructField("file_hash", StringType, nullable = true),
    StructField("file_name", StringType, nullable = true),
    StructField("record_count", LongType, nullable = true),
  ))

  val logSchema: StructType = StructType(Seq(
    StructField("data_version_id", LongType, nullable = false),
    StructField("level", StringType, nullable = false),
    StructField("message", StringType, nullable = false),
    StructField("details", StringType, nullable = true),
    StructField("logged_at", TimestampType, nullable = false),
  ))

  /** F13 SHA-256 of a file's raw bytes (reference: upload.py:47-49). */
  def sha256File(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val bytes = Files.readAllBytes(Paths.get(path))
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  private[store] def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
}
