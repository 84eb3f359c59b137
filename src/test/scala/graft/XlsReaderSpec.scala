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

  test("non-CFB bytes raise a clear error") {
    val p = Files.createTempFile("graft-spec", ".xls")
    Files.write(p, "plain text".getBytes)
    val e = intercept[IllegalArgumentException] { XlsReader.readRows(p.toString) }
    assert(e.getMessage.contains("CFB"))
  }
}
