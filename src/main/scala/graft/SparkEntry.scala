package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.Catalog
import graft.header.HeaderDetector
import graft.io.FileReader
import graft.pipeline.{Ingestor, IngestPipeline}
import graft.queries.{ReadQueries, Registry}
import graft.store.VersionStore

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the reference's own headline computation (SCHEMA.md:248-265)
    * run honestly end-to-end — write CMS-shaped RVU + GPCI CSVs, read them
    * all-string, detect headers dynamically, project + transform + validate
    * + dedup, land them in the versioned store, resolve `*_current` views,
    * and compute the Medicare fee for 99213 in locality 05102. Exercises
    * S1→H1/H3→P2/P3→F2/F5/F6→P5→D1→U2/U3→J2→J5/F15 in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    Registry.configure(spark)
    val work = graft.queries.Scratch.fresh("flagship")

    val rvuCsv = s"$work/pfs_rvu.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(rvuCsv),
      """PFS Relative Value File,,,,,,,
        |HCPCS,MOD,DESCRIPTION,STATUS,WORK RVU,NON-FAC PE RVU,FAC PE RVU,MP RVU
        |99213,26,Office outpatient visit est,A,1.30,1.26,0.55,0.10
        |99213,26,Office outpatient visit est,A,1.30,1.26,0.55,0.10
        |99214,26,Office outpatient visit est,A,1.92,1.68,0.76,0.14
        |,,,,,,,
        |""".stripMargin)
    val gpciCsv = s"$work/pfs_gpci.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(gpciCsv),
      """LOCALITY,LOCALITY NAME,WORK GPCI,PE GPCI,MP GPCI
        |05102,San Francisco,1.060,1.298,0.604
        |01112,Alabama,1.000,0.869,0.575
        |""".stripMargin)

    val store = new VersionStore(spark, s"$work/store")
    val d = java.sql.Date.valueOf("2026-01-01")
    IngestPipeline.ingestFile(spark, store, "PFS_RVU", rvuCsv, "2026-Q1", d)
    IngestPipeline.ingestFile(spark, store, "PFS_GPCI", gpciCsv, "2026-Q1", d)

    val rvuCur = store.currentView("cms.pfs_rvu", "PFS_RVU")
    val gpciCur = store.currentView("cms.pfs_gpci", "PFS_GPCI")
    ReadQueries.feeFor(rvuCur, gpciCur, "99213", "05102",
      conversionFactor = Some(32.7442), modifier = Some("26"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
