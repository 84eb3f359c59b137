package graft.io

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Synthetic XLSX builder for the envelope-ceiling exercise: streams an
  * NCCI_PTP-shaped worksheet of arbitrary row count straight through a
  * ZipOutputStream (never holding the sheet XML in memory — at the
  * reference's 100 MB upload cap the sheet inflates to hundreds of MB).
  * Cell vocabulary deliberately spans the reader's paths: numeric `<v>`
  * cells, shared-string `t="s"` cells, and inline-string `t="inlineStr"`
  * cells; no `r` refs, so the reader's positional-column fallback is
  * exercised too. The rationale column carries a 48-hex-char
  * multiplicative-hash uniquifier purely to keep DEFLATE from collapsing
  * the repetitive XML — that's what makes ~100 MB of .xlsx mean ~100 MB,
  * like a real export full of distinct text. */
object SyntheticXlsx {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Deterministic low-compressibility uniquifier (3×16 hex chars). */
  private def hex48(i: Long): String = {
    def h(x: Long): String = {
      val s = java.lang.Long.toHexString(x)
      "0" * (16 - s.length) + s
    }
    h(i * 0x9E3779B97F4A7C15L) + h((i + 1) * 0xC2B2AE3D27D4EB4FL) +
      h((i + 2) * 0x165667B19E3779F9L)
  }

  /** Write `path` with title junk + header + nRows data rows, same dirt
    * profile as IngestScale's CSV generator (empty rows, ~1% duplicate
    * keys, ~0.5% missing required key, ~0.25% missing modifier). */
  def writeNcciPtp(path: String, nRows: Int): Unit = {
    val zo = new ZipOutputStream(
      new BufferedOutputStream(new FileOutputStream(path), 1 << 20))
    def entry(name: String, content: String): Unit = {
      zo.putNextEntry(new ZipEntry(name))
      zo.write(content.getBytes("UTF-8"))
      zo.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="PTP" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val shared = Seq(
      "National Correct Coding Initiative PTP Edits",         // 0
      "Column 1", "Column 2", "Modifier", "Effective Date",   // 1-4
      "Deletion Date", "PTP Edit Rationale",                  // 5-6
      "*=in existence prior to 1996",                         // 7
      "*", "")                                                // 8-9
    entry("xl/sharedStrings.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">
         |${shared.map(s => s"<si><t>${esc(s)}</t></si>").mkString("\n")}
         |</sst>""".stripMargin)
    val rationales = Array("Misuse of column two with column one",
      "Standards of medical / surgical practice",
      "Mutually exclusive procedures",
      "CPT Manual or CMS manual coding instructions")
    zo.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    val w = new OutputStreamWriter(zo, "UTF-8")
    w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    w.write("<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
    def sCell(idx: Int) = s"""<c t="s"><v>$idx</v></c>"""
    def nCell(v: Long) = s"<c><v>$v</v></c>"
    def iCell(s: String) = s"""<c t="inlineStr"><is><t>${esc(s)}</t></is></c>"""
    val empty = sCell(9)
    // title junk row + header row, mirroring the CSV generator.
    w.write(s"<row>${sCell(0)}</row>")
    w.write("<row>" + (1 to 7).map(sCell).mkString + "</row>")
    var i = 0
    while (i < nRows) {
      if (i % 10000 == 9999) w.write(s"<row>${empty * 7}</row>")
      val k = if (i % 100 == 99) i - 1 else i
      val comp2 = if (i % 200 == 137) empty else nCell(20000 + k % 97997)
      val modifier = if (i % 400 == 211) empty else nCell(i % 3)
      val del = if (i % 7 == 0) nCell(20250101L) else sCell(8)
      val prior = if (i % 11 == 0) sCell(8) else empty
      w.write("<row>")
      w.write(nCell(10000 + k / 97))
      w.write(comp2); w.write(modifier)
      w.write(nCell(20240101L)); w.write(del)
      w.write(iCell(rationales(i % 4) + " " + hex48(i.toLong)))
      w.write(prior)
      w.write("</row>")
      i += 1
    }
    w.write("</sheetData></worksheet>")
    w.flush()
    zo.closeEntry()
    zo.close()
  }
}
