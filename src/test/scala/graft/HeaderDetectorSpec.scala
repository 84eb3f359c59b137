package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.header.HeaderDetector
import graft.header.HeaderDetector.{ColumnMapping, detectHeaderRow, getColumnIndex, isPartialMatch}

import scala.collection.immutable.ListMap

/** Port of the reference's header-detector suite
  * (reference: tests/test_header_detector.py:17-182). Pure Scala — no Spark. */
class HeaderDetectorSpec extends AnyFunSuite {

  private def rows(rs: Seq[String]*): IndexedSeq[Seq[String]] = rs.toIndexedSeq

  test("header on first row") {
    val det = detectHeaderRow(
      rows(Seq("HCPCS", "WORK RVU", "DESCRIPTION"),
        Seq("99213", "1.50", "Office visit"),
        Seq("99214", "2.00", "Office visit complex")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS", "HCPC"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true),
        "description" -> ColumnMapping(Seq("DESCRIPTION"), isRequired = false)))
    assert(det.found)
    assert(det.headerRowIndex.contains(0))
    assert(det.columnMap("hcpcs_code") == "HCPCS")
    assert(det.columnMap.contains("work_rvu"))
    assert(det.error.isEmpty)
  }

  test("header after metadata rows") {
    val det = detectHeaderRow(
      rows(Seq("CMS Physician Fee Schedule", "", ""),
        Seq("Copyright 2024", "", ""),
        Seq("", "", ""),
        Seq("HCPCS", "WORK RVU", "DESCRIPTION"),
        Seq("99213", "1.50", "Office visit")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true)))
    assert(det.found)
    assert(det.headerRowIndex.contains(3))
  }

  test("case-insensitive matching") {
    val det = detectHeaderRow(
      rows(Seq("hcpcs", "Work Rvu", "DESCRIPTION"), Seq("99213", "1.50", "x")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true)))
    assert(det.found)
    assert(det.headerRowIndex.contains(0))
  }

  test("missing required column -> not found, named in error") {
    val det = detectHeaderRow(
      rows(Seq("HCPCS", "DESCRIPTION"), Seq("99213", "Office visit")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true)))
    assert(!det.found)
    assert(det.error.exists(_.contains("work_rvu")))
  }

  test("optional column missing is ok") {
    val det = detectHeaderRow(
      rows(Seq("HCPCS", "WORK RVU"), Seq("99213", "1.50")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true),
        "description" -> ColumnMapping(Seq("DESCRIPTION"), isRequired = false)))
    assert(det.found)
    assert(!det.columnMap.contains("description"))
  }

  test("unmapped columns tracked") {
    val det = detectHeaderRow(
      rows(Seq("HCPCS", "WORK RVU", "EXTRA_COL", "ANOTHER"),
        Seq("99213", "1.50", "foo", "bar")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU"), isRequired = true)))
    assert(det.found)
    assert(det.unmappedColumns.contains("EXTRA_COL"))
    assert(det.unmappedColumns.contains("ANOTHER"))
  }

  test("partial match on long NCCI-style headers") {
    val det = detectHeaderRow(
      rows(Seq("Column 1", "Column 2", "Modifier 0=not allowed 1=allowed 9=N/A"),
        Seq("00100", "00101", "1")),
      ListMap(
        "comprehensive_code" -> ColumnMapping(Seq("Column 1"), isRequired = true),
        "component_code" -> ColumnMapping(Seq("Column 2"), isRequired = true),
        "modifier_indicator" -> ColumnMapping(Seq("Modifier"), isRequired = true)))
    assert(det.found)
    assert(det.columnMap.contains("modifier_indicator"))
  }

  test("multiple header variations") {
    val det = detectHeaderRow(
      rows(Seq("HCPC", "WRVU", "DESC"), Seq("99213", "1.50", "Office visit")),
      ListMap(
        "hcpcs_code" -> ColumnMapping(Seq("HCPCS", "HCPC", "CPT"), isRequired = true),
        "work_rvu" -> ColumnMapping(Seq("WORK RVU", "WRVU"), isRequired = true),
        "description" -> ColumnMapping(Seq("DESCRIPTION", "DESC"), isRequired = false)))
    assert(det.found)
    assert(det.columnMap("hcpcs_code") == "HCPC")
    assert(det.columnMap("work_rvu") == "WRVU")
  }

  test("no header found within scan range") {
    val det = detectHeaderRow(
      rows(Seq("99213", "1.50", "Office visit"), Seq("99214", "2.00", "x")),
      ListMap("hcpcs_code" -> ColumnMapping(Seq("HCPCS"), isRequired = true)),
      maxScanRows = 2)
    assert(!det.found)
    assert(det.error.exists(_.contains("Could not find header row")))
  }

  test("_is_partial_match semantics (header_detector.py:118-141)") {
    assert(isPartialMatch("MODIFIER 0=NOT ALLOWED", "MODIFIER"))
    assert(isPartialMatch("WORK RVU", "WORK RVU (EXTRA)"))
    assert(!isPartialMatch("WO", "WORK RVU")) // abbreviation must be >= 3 chars
    assert(isPartialMatch("WOR", "WORK RVU"))
  }

  test("greedy one-to-one: a matched cell is excluded from later columns") {
    // Both canonical columns accept "CODE"; the single CODE cell must bind
    // to the first canonical column only (header_detector.py:47-75).
    val det = detectHeaderRow(
      rows(Seq("CODE", "OTHER"), Seq("1", "2")),
      ListMap(
        "first_code" -> ColumnMapping(Seq("CODE"), isRequired = true),
        "second_code" -> ColumnMapping(Seq("CODE"), isRequired = false)))
    assert(det.found)
    assert(det.columnMap("first_code") == "CODE")
    assert(!det.columnMap.contains("second_code"))
  }

  test("get_column_index maps names to positions; vanished headers dropped") {
    val idx = getColumnIndex(Seq("HCPCS", "WORK RVU", "X"),
      ListMap("hcpcs_code" -> "HCPCS", "work_rvu" -> "WORK RVU", "ghost" -> "GONE"))
    assert(idx == ListMap("hcpcs_code" -> 0, "work_rvu" -> 1))
  }
}
