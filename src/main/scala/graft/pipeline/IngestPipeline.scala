package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.{Catalog, SourceConfig}
import graft.header.HeaderDetector
import graft.io.FileReader
import graft.store.VersionStore

import scala.collection.immutable.ListMap

/** The end-to-end ingest orchestration — the Spark re-expression of the
  * reference's `POST /upload/{source}/ingest` flow (upload.py:419-561 →
  * ingestor.py:691-783 → 504-648) and its `validate` dry-run twin
  * (upload.py:196-416).
  *
  * One distributed plan per file: all-string scan → driver-side header
  * detection on 15 collected rows → projection → typed transform →
  * validity split → window dedup → versioned write. The quarantine split
  * replaces the reference's write-then-retry-per-row fallback: identical
  * observable outcome (partial success + per-row error strings), one pass.
  */
object IngestPipeline {

  final case class IngestResult(
      versionId: Long, status: String, processed: Long, inserted: Long,
      invalid: Long, duplicates: Long, errors: Seq[String],
      headerRowIndex: Int, unmappedColumns: Seq[String])

  final case class ValidationReport(
      valid: Boolean, dataRows: Long, headerRowIndex: Option[Int],
      columnMap: Map[String, String], unmappedColumns: Seq[String],
      errors: Seq[String], warnings: Seq[String], duplicateFile: Boolean,
      willAppend: Boolean)

  private[graft] def mappingsOf(source: SourceConfig): ListMap[String, HeaderDetector.ColumnMapping] =
    ListMap(source.columns.collect {
      case c if c.acceptedHeaders.nonEmpty =>
        c.internalName -> HeaderDetector.ColumnMapping(c.acceptedHeaders, c.isRequired)
    }: _*)

  /** Parse + detect + project + transform + split. Shared by ingest and
    * validate. Returns (typedValid, quarantine, detection) — both returned
    * frames share the `typed` parent, which is PERSISTED so the ingest's
    * several actions (insert count, invalid count, dup count, data write)
    * each start from the cached typed rows instead of re-parsing the file.
    * Callers release it via the also-returned handle. */
  private def prepare(spark: SparkSession, source: SourceConfig, path: String):
      (DataFrame, DataFrame, HeaderDetector.Detection, DataFrame) = {
    val (raw, _) = FileReader.parseFile(spark, path)
    val head = FileReader.firstRows(raw, HeaderDetector.MaxScanRows)
    val det = HeaderDetector.detectHeaderRow(head, mappingsOf(source))
    if (!det.found)
      throw new IllegalArgumentException(det.error.getOrElse("header not found"))
    val hdrIdx = det.headerRowIndex.get
    val colIdx = HeaderDetector.getColumnIndex(head(hdrIdx), det.columnMap)
    val numbered = FileReader.withRowNumbers(raw)
    val dataRows = numbered.filter(col("_row_number") > hdrIdx + 1)
    val nonEmpty = Ingestor.filterEmptyRows(dataRows, colIdx.values.map(i => s"_c$i").toSeq)
    // localCheckpoint (not just persist): the typed lineage is hundreds of
    // parse/when expressions per column, and every downstream action (insert
    // count, invalid count, error collect, data write) would re-ANALYZE that
    // whole tree on the driver — at this point planning time, not execution
    // time, dominates an ingest. Truncating the lineage makes each follow-up
    // plan trivial. Fault-tolerance note: an ingest input is ≤100 MB by
    // contract (the validate-time size cap), so losing a cached partition
    // and restarting the ingest is cheaper than keeping the lineage.
    val typed = Ingestor.transformColumns(Ingestor.project(nonEmpty, colIdx), source)
      .localCheckpoint()
    val (valid, quarantine) = Ingestor.validateSplit(typed, source.uniqueKeys)
    (valid, quarantine, det, typed)
  }

  /** Full ingest with the reference's partial-success semantics:
    * `completed` iff any rows landed (ingestor.py:624, 747-768); all-fail →
    * `failed` with a first-5 error summary (770-774). NCCI_PTP multi-part:
    * if a completed version already exists for (source, label, variant) the
    * file appends under the SAME version id (691-783). */
  def ingestFile(spark: SparkSession, store: VersionStore, sourceCode: String,
                 path: String, versionLabel: String,
                 effectiveDate: java.sql.Date, variant: Option[String] = None,
                 markAsCurrent: Boolean = true): IngestResult = try {
    val source = Catalog(sourceCode)
    val fileHash = VersionStore.sha256File(path)
    val fileName = path.substring(path.lastIndexOf('/') + 1)

    val existing = if (source.multiPart)
      store.versions.filter(
        col("source_code") === source.sourceCode &&
          col("version_label") === versionLabel &&
          (col("variant") <=> lit(variant.orNull)) &&
          col("status") === "completed")
        .select("data_version_id", "part_count").collect().headOption
    else None

    val (valid, quarantine, det, typed) = prepare(spark, source, path)
    val (unique, _) = Ingestor.dedupFirstWins(valid, source.uniqueKeys)
    val toWrite = unique.drop("_row_number").persist()
    val inserted = toWrite.count()
    // Valid + invalid in one job over the checkpointed typed rows.
    // Duplicates = valid minus survivors (dedup keeps null-key rows, so the
    // difference is exactly the rank>1 rows) — a count over the cached typed
    // rows instead of a second run of the dedup window.
    val (validCount, invalidCount) = Ingestor.validCounts(typed, source.uniqueKeys)
    val dupCount = validCount - inserted
    // Error strings come to the driver CAPPED at maxCollectedErrors (the
    // exact invalid count is still computed distributed) — an adversarial
    // all-invalid file must not become a driver-OOM vector.
    val invalidRows = quarantine.select("_error", "_row_number")
      .orderBy("_row_number")
      .limit(Catalog.Limits.maxCollectedErrors)
      .collect().map(_.getString(0)).toSeq

    val result = existing match {
      case Some(row) => // U4 append path
        val versionId = row.getLong(0)
        store.writeData(source.targetTable, versionId, toWrite, append = true)
        store.appendPart(versionId, row.getInt(1) + 1, fileHash, fileName, inserted)
        store.log(versionId, "INFO", s"Appended part ${row.getInt(1) + 1} ($inserted rows)")
        IngestResult(versionId, "completed", inserted + invalidCount + dupCount,
          inserted, invalidCount, dupCount, invalidRows,
          det.headerRowIndex.get, det.unmappedColumns)
      case None =>
        val versionId = store.createVersion(source.sourceCode, versionLabel,
          effectiveDate, variant, fileHash, fileName)
        if (inserted > 0) {
          store.writeData(source.targetTable, versionId, toWrite)
          store.completeVersion(versionId, inserted,
            markCurrentFor = if (markAsCurrent) Some((source.sourceCode, variant)) else None)
          if (invalidCount > 0)
            store.log(versionId, "WARNING",
              s"$invalidCount rows failed validation",
              Some(invalidRows.take(5).mkString("[\"", "\",\"", "\"]")))
          IngestResult(versionId, "completed", inserted + invalidCount + dupCount,
            inserted, invalidCount, dupCount, invalidRows,
            det.headerRowIndex.get, det.unmappedColumns)
        } else {
          val summary = invalidRows.take(5).mkString("; ")
          store.failVersion(versionId, s"No rows inserted. First errors: $summary")
          IngestResult(versionId, "failed", invalidCount + dupCount, 0,
            invalidCount, dupCount, invalidRows,
            det.headerRowIndex.get, det.unmappedColumns)
        }
    }
    toWrite.unpersist()
    typed.unpersist()
    result
  } finally {
    // The eager localCheckpoint in prepare() materialized the grid, so no
    // frame re-reads the upload — any XLSX scratch XML can go now instead
    // of parking ~10× the upload size on disk until JVM exit.
    FileReader.releaseScratch()
  }

  /** Dry-run validation preview (upload.py:196-416 + validator.py:13-87):
    * extension/duplicate checks, header detection, row counts, drift
    * warnings vs the previous completed version, sampled type warnings. */
  def validateFile(spark: SparkSession, store: VersionStore, sourceCode: String,
                   path: String, versionLabel: String,
                   variant: Option[String] = None): ValidationReport = {
    val source = Catalog(sourceCode)
    val ext = path.substring((path.lastIndexOf('.') max 0)).toLowerCase
    if (!Seq(".csv", ".xlsx", ".xls", ".txt").contains(ext))
      return ValidationReport(valid = false, 0, None, Map.empty, Seq.empty,
        Seq(s"Unsupported file type: $ext"), Seq.empty,
        duplicateFile = false, willAppend = false)

    // Size cap before any read of the content — the reference rejects
    // oversized uploads with this exact message (upload.py:231-242,
    // config.py:22 max_upload_size_mb=100).
    val fileSize = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    if (fileSize > Catalog.Limits.maxFileSizeBytes) {
      val sizeMb = String.format(java.util.Locale.ROOT, "%.1f",
        Double.box(fileSize / 1024.0 / 1024.0))
      val maxMb = Catalog.Limits.maxFileSizeBytes / 1024 / 1024
      return ValidationReport(valid = false, 0, None, Map.empty, Seq.empty,
        Seq(s"File size ($sizeMb MB) exceeds maximum ($maxMb MB)"), Seq.empty,
        duplicateFile = false, willAppend = false)
    }

    val fileHash = VersionStore.sha256File(path)
    val isDup = store.isDuplicateFile(source.sourceCode, fileHash)

    try {
    val (raw, _) = FileReader.parseFile(spark, path)
    val head = FileReader.firstRows(raw, HeaderDetector.MaxScanRows)
    val det = HeaderDetector.detectHeaderRow(head, mappingsOf(source))
    if (!det.found)
      return ValidationReport(valid = false, 0, None, Map.empty, Seq.empty,
        det.error.toSeq, Seq.empty, isDup, willAppend = false)

    val hdrIdx = det.headerRowIndex.get
    val colIdx = HeaderDetector.getColumnIndex(head(hdrIdx), det.columnMap)
    val numbered = FileReader.withRowNumbers(raw)
    val dataRows = numbered.filter(col("_row_number") > hdrIdx + 1)
    val nData = dataRows.count()
    val errors = if (nData == 0) Seq("File contains no data rows") else Seq.empty

    // D5 drift vs previous completed version of this source
    val prevCount = store.versions
      .filter(col("source_code") === source.sourceCode && col("status") === "completed")
      .orderBy(col("effective_date").desc).limit(1)
      .select("record_count").collect().headOption.flatMap(r => Option(r.get(0)))
      .map(_.asInstanceOf[Long])
    val driftWarnings = prevCount.toSeq.collect {
      case p if nData < p * 0.5 =>
        s"Row count $nData is less than half the previous upload ($p)"
      case p if nData > p * 1.5 =>
        s"Row count $nData is more than 1.5x the previous upload ($p)"
    }

    // D6 sampled type warnings over the first 100 data rows
    val projected = Ingestor.project(dataRows.limit(Catalog.Limits.typeValidationSampleRows), colIdx)
    val typeWarnings = Ingestor.typeValidationWarnings(projected, source)
      .collect().map { r =>
        s"Column '${r.getAs[String]("column")}' expects ${r.getAs[String]("expected_type")} " +
          s"but row ${r.getAs[Long]("row_number")} has '${r.getAs[String]("value")}'"
      }.toSeq

    val willAppend = source.multiPart && !store.versions.filter(
      col("source_code") === source.sourceCode &&
        col("version_label") === versionLabel &&
        (col("variant") <=> lit(variant.orNull)) &&
        col("status") === "completed").isEmpty

    ValidationReport(errors.isEmpty && !isDup, nData, Some(hdrIdx),
      det.columnMap, det.unmappedColumns, errors,
      driftWarnings ++ typeWarnings, isDup, willAppend)
    // All report fields are computed values; nothing re-reads the upload
    // after this point, so the dry run cleans up its scratch XML too.
    } finally FileReader.releaseScratch()
  }
}
