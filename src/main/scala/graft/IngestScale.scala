package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: exercise the FULL ingestion pipeline at the reference's
  * operating-envelope ceiling — a ~100 MB upload (the reference rejects
  * anything larger; `file_processor.py` MAX_FILE_SIZE). Generates an
  * NCCI_PTP-shaped CSV of ~1.7M rows with realistic dirt (title row above
  * the header, empty rows, ~1% duplicate unique keys, ~0.5% rows missing a
  * required field), runs parse → header-detect → project → transform →
  * validate/quarantine → dedup → versioned land, and prints per-stage
  * wall times + counter reconciliation. Findings recorded in PLANS.md
  * ("100 MB ingestion exercise"). Run:
  * `sbt "runMain graft.IngestScale [/tmp/outdir]"`. */
object IngestScale {

  def main(args: Array[String]): Unit = {
    val work = if (args.nonEmpty) args(0)
      else java.nio.file.Files.createTempDirectory("graft-ingest100").toString
    new java.io.File(work).mkdirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Registry.configure(spark)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ingest100] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- Generate the ~100 MB upload (driver-side, like a real upload).
    val path = s"$work/ncci_ptp_100mb.csv"
    val nRows = 1700000
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
      println(f"[ingest100] file size: ${new java.io.File(path).length() / 1e6}%.1f MB")
    }

    // ---- Full pipeline, one call — the same path the flagship exercises.
    // Fresh store per run: NCCI_PTP is multi-part, so re-ingesting into an
    // existing store under the same version label APPENDS (by design) and
    // the reconciliation below would see both runs' rows.
    val store = new graft.store.VersionStore(spark,
      s"$work/store-${java.lang.Long.toHexString(System.nanoTime())}")
    val result = timed("full ingest (parse->detect->transform->quarantine->dedup->land)") {
      graft.pipeline.IngestPipeline.ingestFile(spark, store, "NCCI_PTP", path,
        "2026-Q1", java.sql.Date.valueOf("2026-01-01"), Some("PRACTITIONER"))
    }
    println(s"[ingest100] status=${result.status} processed=${result.processed} " +
      s"inserted=${result.inserted} invalid=${result.invalid} " +
      s"duplicates=${result.duplicates}")

    // ---- Read-back checks: landed rows queryable + counters reconcile.
    timed("current-view read-back + counter reconciliation") {
      val cur = store.currentView("cms.ncci_ptp", "NCCI_PTP", Some("PRACTITIONER"))
      val n = cur.count()
      println(s"[ingest100] current view rows: $n")
      require(n == result.inserted, s"view rows $n != inserted ${result.inserted}")
      val mods = cur.groupBy("modifier_indicator").count()
        .orderBy("modifier_indicator").collect()
      println("[ingest100] modifier histogram: " +
        mods.map(r => s"${r.get(0)}:${r.getLong(1)}").mkString(" "))
    }
    spark.stop()
  }
}
