package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.IngestPipeline
import graft.store.VersionStore

/** End-to-end orchestration specs: partial success, all-fail, multi-part
  * append, and the dry-run validation report. */
class IngestPipelineSpec extends SparkSpecBase {

  private def newStore(): VersionStore =
    new VersionStore(spark, Files.createTempDirectory("graft-ip").toString)

  private def csv(content: String): String = {
    val p = Files.createTempFile("graft-ip", ".csv")
    Files.writeString(p, content)
    p.toString
  }

  private val d = java.sql.Date.valueOf("2026-01-01")

  test("partial success: valid rows land, invalid rows reported, status completed") {
    val store = newStore()
    val path = csv(
      """HCPCS,OPPS CAP
        |99213,120.50
        |,90.00
        |99214,140.00
        |99213,999.99
        |""".stripMargin)
    val r = IngestPipeline.ingestFile(spark, store, "PFS_OPPS_CAP", path, "2026-Q1", d)
    assert(r.status == "completed")
    assert(r.inserted == 2)      // 99213 + 99214 (dup 99213 removed)
    assert(r.invalid == 1)       // blank hcpcs_code
    assert(r.duplicates == 1)    // second 99213
    assert(r.errors.head.contains("Missing required key column 'hcpcs_code'"))
    val cur = store.currentView("cms.pfs_opps_cap", "PFS_OPPS_CAP")
    assert(cur.count() == 2)
    // first-wins: the kept 99213 carries the FIRST file value
    assert(cur.filter(col("hcpcs_code") === "99213").head
      .getAs[Double]("opps_cap_amount") == 120.50)
  }

  test("distributed-XLSX ingest releases its scratch XML after landing") {
    val store = newStore()
    val scratch = Files.createTempDirectory("graft-scratch").toString
    val dir = Files.createTempDirectory("graft-ip-xlsx").toString
    val p = s"$dir/ncci.xlsx"
    graft.io.SyntheticXlsx.writeNcciPtp(p, nRows = 2000)
    spark.conf.set("graft.xlsx.distributedThresholdBytes", "0")
    spark.conf.set("graft.xlsx.chunkBytes", "65536")
    spark.conf.set("graft.xlsx.scratchDir", scratch)
    try {
      val r = IngestPipeline.ingestFile(spark, store, "NCCI_PTP", p,
        "2026-Q1", d, Some("PRACTITIONER"))
      assert(r.status == "completed" && r.inserted > 0)
      // the inflated sheet XML must not park on disk until JVM exit
      val leftovers = new java.io.File(scratch).listFiles()
      assert(leftovers == null || leftovers.isEmpty,
        s"scratch not released: ${leftovers.mkString(",")}")
    } finally {
      spark.conf.unset("graft.xlsx.distributedThresholdBytes")
      spark.conf.unset("graft.xlsx.chunkBytes")
      spark.conf.unset("graft.xlsx.scratchDir")
    }
  }

  test("all rows invalid -> status failed with first-5 error summary") {
    val store = newStore()
    val path = csv(
      """HCPCS,OPPS CAP
        |,1.00
        |,2.00
        |""".stripMargin)
    val r = IngestPipeline.ingestFile(spark, store, "PFS_OPPS_CAP", path, "2026-Q1", d)
    assert(r.status == "failed")
    assert(r.inserted == 0)
    val v = store.versions.filter(col("data_version_id") === r.versionId).head
    assert(v.getAs[String]("status") == "failed")
    assert(v.getAs[String]("error_message").contains("No rows inserted"))
  }

  test("NCCI_PTP multi-part: second file appends under the same version id") {
    val store = newStore()
    def ptpCsv(rows: String) = csv(
      s"""Column 1,Column 2,Modifier,Effective Date,Deletion Date
         |$rows
         |""".stripMargin)
    val r1 = IngestPipeline.ingestFile(spark, store, "NCCI_PTP",
      ptpCsv("00100,00101,1,20240101,*"), "2026-Q1", d, Some("HOSPITAL"))
    assert(r1.status == "completed")
    val r2 = IngestPipeline.ingestFile(spark, store, "NCCI_PTP",
      ptpCsv("00200,00201,0,20240101,*\n00300,00301,9,20240101,20250101"),
      "2026-Q1", d, Some("HOSPITAL"))
    assert(r2.versionId == r1.versionId) // appended, not a new version
    val v = store.versions.filter(col("data_version_id") === r1.versionId).head
    assert(v.getAs[Long]("record_count") == 3)  // 1 + 2
    assert(v.getAs[Int]("part_count") == 2)
    assert(store.parts.filter(col("data_version_id") === r1.versionId).count() == 1)
    assert(store.data("cms.ncci_ptp")
      .filter(col("data_version_id") === r1.versionId).count() == 3)
  }

  test("validation report: counts, drift warning, sampled type warnings, dup file") {
    val store = newStore()
    val good = csv(
      """HCPCS,OPPS CAP
        |99213,120.50
        |99214,oops
        |99215,140.00
        |99216,1.00
        |""".stripMargin)
    val rep = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", good, "2026-Q1")
    assert(rep.valid && rep.dataRows == 4 && rep.headerRowIndex.contains(0))
    assert(rep.warnings.exists(w => w.contains("opps_cap_amount") && w.contains("oops")))

    // ingest it, then a tiny file must trigger the drift warning, and the
    // same file again must flag duplicate
    IngestPipeline.ingestFile(spark, store, "PFS_OPPS_CAP", good, "2026-Q1", d)
    val tiny = csv("HCPCS,OPPS CAP\n99213,1.00\n")
    val rep2 = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", tiny, "2026-Q2")
    assert(rep2.warnings.exists(_.contains("less than half")))
    val rep3 = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", good, "2026-Q2")
    assert(rep3.duplicateFile && !rep3.valid)
  }

  test("oversized upload is rejected with the reference's size-cap message") {
    val store = newStore()
    // A sparse file: size() reports >100 MB without writing the bytes — the
    // cap must reject on size alone, before any read of the content.
    val big = Files.createTempFile("graft-ip", ".csv")
    val raf = new java.io.RandomAccessFile(big.toFile, "rw")
    try raf.setLength(105L * 1024 * 1024) finally raf.close()
    val rep = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", big.toString, "2026-Q1")
    assert(!rep.valid)
    assert(rep.errors == Seq("File size (105.0 MB) exceeds maximum (100 MB)"))
  }

  test("all-invalid file: error list capped at 10k, counts stay exact") {
    val store = newStore()
    val n = graft.config.Catalog.Limits.maxCollectedErrors + 50
    val body = (1 to n).map(_ => ",1.00").mkString("\n")
    val path = csv(s"HCPCS,OPPS CAP\n$body\n")
    val r = IngestPipeline.ingestFile(spark, store, "PFS_OPPS_CAP", path, "2026-Q1", d)
    assert(r.status == "failed")
    assert(r.invalid == n)                 // exact, computed distributed
    assert(r.errors.size == graft.config.Catalog.Limits.maxCollectedErrors)
    assert(r.errors.head.contains("Row 2:")) // first-N by row order
  }

  test("ingest of a headerless file raises the detector's message") {
    val store = newStore()
    val noHdr = csv("a,b\n1,2\n")
    val e = intercept[IllegalArgumentException] {
      IngestPipeline.ingestFile(spark, store, "PFS_OPPS_CAP", noHdr, "2026-Q1", d)
    }
    assert(e.getMessage.contains("Could not find header row"))
    assert(store.versions.isEmpty) // nothing half-created
  }

  test("unsupported extension and missing header are reported, not thrown") {
    val store = newStore()
    val pdf = Files.createTempFile("graft-ip", ".pdf")
    Files.writeString(pdf, "junk")
    val rep = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", pdf.toString, "2026-Q1")
    assert(!rep.valid && rep.errors.head.contains("Unsupported file type"))
    val noHdr = csv("a,b\n1,2\n")
    val rep2 = IngestPipeline.validateFile(spark, store, "PFS_OPPS_CAP", noHdr, "2026-Q1")
    assert(!rep2.valid && rep2.errors.head.contains("Could not find header row"))
  }
}
