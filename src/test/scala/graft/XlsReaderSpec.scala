package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

import graft.io.{FileReader, XlsReader}

/** BIFF8/CFB subset reader spec against a synthetically-built legacy .xls
  * (CFB container with one Workbook stream: globals BOF + SST, sheet BOF +
  * LABELSST/NUMBER/RK cells, EOFs). */
class XlsReaderSpec extends SparkSpecBase {

  private def buildXls(): String = graft.io.SyntheticXls.standardFixture()

  test("BIFF8 grid: shared strings, numbers, RK ints, empty-cell padding") {
    val rows = XlsReader.readRows(buildXls())
    assert(rows == IndexedSeq(
      IndexedSeq("HCPCS", "MOD"),
      IndexedSeq("99213", "1.5"),
      IndexedSeq("A1234", "42")))
  }

  test("parseFile dispatches .xls to the BIFF reader with all-string schema") {
    val (df, ext) = FileReader.parseFile(spark, buildXls())
    assert(ext == ".xls")
    val rows = df.collect().map(_.toSeq)
    assert(rows(0) == Seq("HCPCS", "MOD"))
    assert(rows(1) == Seq("99213", "1.5"))
    assert(df.schema.fields.forall(_.dataType == org.apache.spark.sql.types.StringType))
  }

  test("SST spanning Continue records: between-strings and mid-string splits") {
    import graft.io.SyntheticXls._
    import java.nio.{ByteBuffer, ByteOrder}
    // SST header claims 3 strings; fragment 1 holds "AAAA" + the header of
    // "BBBBBB" with only 2 chars; Continue 1 re-declares grbit and carries
    // the remaining 4 chars; Continue 2 starts at a string boundary ("CC").
    val header = { val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(3).putInt(3); b.array() }
    val sA = biffString("AAAA")
    val sBheader = { val b = ByteBuffer.allocate(3).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(6.toShort).put(0.toByte); b.array() }
    val frag1 = header ++ sA ++ sBheader ++ "BB".getBytes("ISO-8859-1")
    val frag2 = Array(0.toByte) ++ "BBBB".getBytes("ISO-8859-1") // grbit + rest
    val frag3 = biffString("CC")
    val workbook =
      bof(0x05) ++ rec(0xFC, frag1) ++ rec(0x3C, frag2) ++ rec(0x3C, frag3) ++ eof ++
      bof(0x10) ++ labelSst(0, 0, 0) ++ labelSst(0, 1, 1) ++ labelSst(0, 2, 2) ++ eof
    val p = Files.createTempFile("graft-spec", ".xls")
    Files.write(p, cfb("Workbook", workbook))
    val rows = XlsReader.readRows(p.toString)
    assert(rows == IndexedSeq(IndexedSeq("AAAA", "BBBBBB", "CC")))
  }

  test("non-CFB bytes raise a clear error") {
    val p = Files.createTempFile("graft-spec", ".xls")
    Files.write(p, "plain text".getBytes)
    val e = intercept[IllegalArgumentException] { XlsReader.readRows(p.toString) }
    assert(e.getMessage.contains("CFB"))
  }
}
