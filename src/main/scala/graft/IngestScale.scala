package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: exercise the FULL ingestion pipeline at the reference's
  * operating-envelope ceiling — a ~100 MB upload (the reference rejects
  * anything larger; `file_processor.py` MAX_FILE_SIZE) — in each upload
  * format the reference accepts. Generates an NCCI_PTP-shaped file with
  * realistic dirt (title row above the header, empty rows, ~1% duplicate
  * unique keys, ~0.5% rows missing a required field), runs parse →
  * header-detect → project → transform → validate/quarantine → dedup →
  * versioned land, and prints per-stage wall times, peak driver heap,
  * and counter reconciliation. Formats:
  *  - csv: ~100 MB, 1.7M rows (the envelope ceiling proper)
  *  - xlsx: ~100 MB zip, 2.6M rows — the driver-side zip+StAX bridge's
  *    worst case (the sheet XML inflates to ~700 MB)
  *  - xls: BIFF8's own format ceiling, 65,536 rows (the sheet cannot be
  *    larger; size is bounded by the format, not the 100 MB cap)
  * Findings recorded in PLANS.md ("100 MB ingestion exercise"). Run:
  * `sbt "runMain graft.IngestScale [/tmp/outdir] [csv,xlsx,xls]"`. */
object IngestScale {

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ingest100] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def heapPools =
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asInstanceOf[
      java.util.List[java.lang.management.MemoryPoolMXBean]]

  private def resetPeakHeap(): Unit =
    heapPools.forEach(p =>
      if (p.getType == java.lang.management.MemoryType.HEAP) p.resetPeakUsage())

  private def peakHeapMb: Long = {
    var sum = 0L
    heapPools.forEach(p =>
      if (p.getType == java.lang.management.MemoryType.HEAP)
        sum += p.getPeakUsage.getUsed)
    sum / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty && args(0) != "-") args(0)
      else java.nio.file.Files.createTempDirectory("graft-ingest100").toString
    val formats = if (args.length > 1) args(1).split(",").toSeq else Seq("csv")
    new java.io.File(work).mkdirs()
    val spark = Sessions.local(defaultCpus = 32)
    graft.queries.Registry.configure(spark)
    formats.foreach {
      case "csv" => runOne(spark, work, "csv", generateCsv(work, 1700000))
      case "xlsx" => runOne(spark, work, "xlsx",
        timed("generate 2,600,000-row XLSX") {
          val p = s"$work/ncci_ptp_100mb.xlsx"
          graft.io.SyntheticXlsx.writeNcciPtp(p, 2600000)
          p
        })
      case "xls" => runOne(spark, work, "xls",
        timed("generate 65,536-row BIFF8 XLS (format ceiling)") {
          val p = s"$work/ncci_ptp_ceiling.xls"
          graft.io.SyntheticXls.ncciPtpCeiling(p)
          p
        })
      case other => println(s"[ingest100] unknown format '$other' (csv,xlsx,xls)")
    }
    spark.stop()
  }

  /** Generate the ~100 MB CSV upload (driver-side, like a real upload). */
  private def generateCsv(work: String, nRows: Int): String = {
    val path = s"$work/ncci_ptp_100mb.csv"
    timed(f"generate $nRows%,d-row CSV") {
      val w = new java.io.BufferedWriter(
        new java.io.FileWriter(path), 1 << 20)
      w.write("National Correct Coding Initiative PTP Edits,,,,,,\n") // title junk
      w.write("Column 1,Column 2,Modifier,Effective Date,Deletion Date," +
        "PTP Edit Rationale,*=in existence prior to 1996\n")
      val rationales = Array("Misuse of column two with column one",
        "Standards of medical / surgical practice", "Mutually exclusive procedures",
        "CPT Manual or CMS manual coding instructions")
      var i = 0
      while (i < nRows) {
        if (i % 10000 == 9999) w.write(",,,,,,\n") // empty row (P2 filter)
        // ~1% duplicate unique keys: every 100th row repeats the previous
        // key pair; first-wins dedup must drop it.
        val k = if (i % 100 == 99) i - 1 else i
        val comp = f"${10000 + k / 97}%05d"
        val comp2 = f"${20000 + k % 97997}%05d"
        // ~0.5% rows missing a required KEY (component code) → P5
        // quarantine (required-field-but-not-key gaps land as null, the
        // reference's semantics — exercised by the empty modifier below).
        val comp2v = if (i % 200 == 137) "" else comp2
        val modifier = if (i % 400 == 211) "" else String.valueOf(i % 3)
        val del = if (i % 7 == 0) "20250101" else "*"
        val prior = if (i % 11 == 0) "*" else ""
        w.write(s"$comp,$comp2v,$modifier,20240101,$del," +
          s"${rationales(i % 4)},$prior\n")
        i += 1
      }
      w.close()
    }
    path
  }

  /** Full pipeline + read-back reconciliation over one generated upload.
    * Fresh store per run: NCCI_PTP is multi-part, so re-ingesting into an
    * existing store under the same version label APPENDS (by design) and
    * the reconciliation below would see both runs' rows. */
  private def runOne(spark: SparkSession, work: String, label: String,
                     path: String): Unit = {
    println(f"[ingest100] ($label) file size: ${new java.io.File(path).length() / 1e6}%.1f MB")
    resetPeakHeap()
    val store = new graft.store.VersionStore(spark,
      s"$work/store-$label-${java.lang.Long.toHexString(System.nanoTime())}")
    val result = timed(s"($label) full ingest (parse->detect->transform->quarantine->dedup->land)") {
      graft.pipeline.IngestPipeline.ingestFile(spark, store, "NCCI_PTP", path,
        "2026-Q1", java.sql.Date.valueOf("2026-01-01"), Some("PRACTITIONER"))
    }
    println(s"[ingest100] ($label) status=${result.status} processed=${result.processed} " +
      s"inserted=${result.inserted} invalid=${result.invalid} " +
      s"duplicates=${result.duplicates} peakHeap=${peakHeapMb}MB")
    timed(s"($label) current-view read-back + counter reconciliation") {
      val cur = store.currentView("cms.ncci_ptp", "NCCI_PTP", Some("PRACTITIONER"))
      val n = cur.count()
      println(s"[ingest100] ($label) current view rows: $n")
      require(n == result.inserted, s"view rows $n != inserted ${result.inserted}")
      val mods = cur.groupBy("modifier_indicator").count()
        .orderBy("modifier_indicator").collect()
      println(s"[ingest100] ($label) modifier histogram: " +
        mods.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" "))
    }
  }
}
