package graft.header

import scala.collection.immutable.ListMap

/** Dynamic header-row detection (schema inference for messy tabular files).
  *
  * Pure-Scala port of the reference algorithm
  * (reference: app/services/header_detector.py:10-167): scan the first ≤15
  * rows; for each row, greedily match each canonical column's accepted
  * headers against not-yet-claimed cells (exact match first, then partial);
  * a row wins if every required column matched and at least one column
  * matched at all.
  *
  * Deliberately driver-side: the scan is bounded (`df.limit(15).collect()`
  * upstream), so this never touches executor-scale data — exactly the
  * reference's own bounded scan. Match greediness is order-sensitive, so
  * callers must pass `columnMappings` as an ordered map (ListMap / ordered
  * Seq) — reference header_detector.py:47-75.
  */
object HeaderDetector {

  /** Accepted headers + requiredness for one canonical column. */
  final case class ColumnMapping(headers: Seq[String], isRequired: Boolean)

  final case class Detection(
      found: Boolean,
      headerRowIndex: Option[Int],
      columnMap: ListMap[String, String], // canonical name -> file header (original case)
      unmappedColumns: Seq[String],
      error: Option[String],
  )

  val MaxScanRows = 15 // reference: app/config.py:24

  /** H1 detect_header_row. `rows` are the raw first rows of the file, each a
    * sequence of cell strings (any ragged tail handled by caller padding). */
  def detectHeaderRow(
      rows: IndexedSeq[Seq[String]],
      columnMappings: ListMap[String, ColumnMapping],
      maxScanRows: Int = MaxScanRows,
  ): Detection = {
    val rowsToScan = math.min(maxScanRows, rows.length)

    var rowIdx = 0
    while (rowIdx < rowsToScan) {
      val original = rows(rowIdx).map(v => Option(v).getOrElse("").trim)
      val upper = original.map(_.toUpperCase)

      var columnMap = ListMap.empty[String, String]
      val matchedIndices = scala.collection.mutable.Set.empty[Int]

      for ((internalName, info) <- columnMappings) {
        val knownHeaders = info.headers.map(_.toUpperCase)
        var matched = false
        var colIdx = 0
        while (!matched && colIdx < upper.length) {
          val cell = upper(colIdx)
          if (!matchedIndices.contains(colIdx) && cell.nonEmpty) {
            if (knownHeaders.contains(cell)) {
              columnMap += internalName -> original(colIdx)
              matchedIndices += colIdx
              matched = true
            } else if (knownHeaders.exists(isPartialMatch(cell, _))) {
              columnMap += internalName -> original(colIdx)
              matchedIndices += colIdx
              matched = true
            }
          }
          colIdx += 1
        }
      }

      val requiredFound = columnMappings.forall { case (name, info) =>
        !info.isRequired || columnMap.contains(name)
      }

      if (requiredFound && columnMap.nonEmpty) {
        val unmapped = original.indices.collect {
          case i if !matchedIndices.contains(i) && upper(i).nonEmpty => original(i)
        }
        return Detection(found = true, Some(rowIdx), columnMap, unmapped, None)
      }
      rowIdx += 1
    }

    val required = columnMappings.collect { case (n, i) if i.isRequired => n }
    Detection(
      found = false, None, ListMap.empty, Seq.empty,
      Some(s"Could not find header row in first $rowsToScan rows. " +
        s"Missing required columns: ${required.mkString(", ")}"),
    )
  }

  /** H2 _is_partial_match: cell startsWith known, or known startsWith cell
    * with |cell| ≥ 3. Reference: header_detector.py:118-141. */
  def isPartialMatch(cellValue: String, knownHeader: String): Boolean =
    cellValue.startsWith(knownHeader) ||
      (knownHeader.startsWith(cellValue) && cellValue.length >= 3)

  /** H3 get_column_index: canonical name -> 0-based file column index,
    * silently dropping columns whose header text vanished.
    * Reference: header_detector.py:144-167. */
  def getColumnIndex(
      headerRow: Seq[String],
      columnMap: ListMap[String, String],
  ): ListMap[String, Int] = {
    // Built left-to-right so the LAST duplicate header wins, matching the
    // reference's dict comprehension overwrite behavior.
    val lastWins = headerRow.map(v => Option(v).getOrElse("").trim).zipWithIndex.toMap
    columnMap.collect { case (name, hdr) if lastWins.contains(hdr) => name -> lastWins(hdr) }
  }
}
