package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Multi-JVM smoke (VERDICT r13 item 5): run a representative query
  * subset under `local-cluster[2,4,2048]` — REAL executor JVMs with real
  * serialization boundaries, task retries, and remote block fetches, none
  * of which `local[N]` (one JVM) can exercise — and require bit-identical
  * results vs the same queries on plain `local[8]` in the same process.
  *
  * What this actually proves beyond local mode:
  *  - every task closure + native Catalyst expression (FloatDot,
  *    LongSqDist, the Bridge-registered kernels) serializes to and
  *    executes in a separate JVM;
  *  - the XLSX `graft.xlsx.scratchDir` executor-read contract
  *    (FileReader.scala: executors byte-scan row ranges of the inflated
  *    sheet) holds when the reader is NOT the driver process;
  *  - task RETRY determinism: an injected first-attempt failure
  *    (attemptNumber == 0) retries and still produces the exact sum —
  *    local[N] never retries, local-cluster does;
  *  - iterative lineage truncation (localCheckpoint) stores blocks on
  *    executors and survives multi-round loops (pagerank).
  *
  * Usage: `runMain graft.ClusterSmoke [sfDir]` (default sf0.01). Prints
  * `[cluster] ... OK` lines; any mismatch throws. */
object ClusterSmoke {

  private val queryNames = Seq(
    "q_d8_group_category",  // groupBy shuffle
    "q_j1_lateral_top1",    // window rank-rewrite join
    "q_agg1_pricing_summary", // multi-agg + decimals
    "q_llm_ann_brute",      // native FloatDot expression on executors
    "q_llm_exact_dedup",    // hash dedup shuffle
    "q_graph_pagerank")     // iterative + localCheckpoint rounds

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val work = Files.createTempDirectory("graft-cluster").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$work/scratch"))

    def session(master: String): SparkSession = {
      val b = SparkSession.builder()
        .master(master)
        .appName("graft-cluster-smoke")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        // Same-host workers: /tmp is "shared storage" here; on a real
        // cluster this must be NFS/object storage (CLUSTER.md).
        .config("graft.xlsx.scratchDir", s"$work/scratch")
      val b2 =
        if (master.startsWith("local-cluster"))
          // Executors are launched as separate JVMs by the in-process
          // Worker; they need the application classes + spark jars on
          // their classpath explicitly (nothing is shipped in this mode).
          b.config("spark.executor.extraClassPath",
              System.getProperty("java.class.path"))
            .config("spark.executor.memory", "1536m")
        else b
      val s = b2.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    def runQueries(spark: SparkSession): Map[String, Vector[String]] =
      queryNames.map { name =>
        val rows = graft.SparkEntry.queries(name)(spark, sfDir)
          .collect().map(_.toString).sorted.toVector
        name -> rows
      }.toMap

    // ---- Phase A: real executor JVMs -----------------------------------
    val t0 = System.nanoTime()
    val cs = session("local-cluster[2,4,2048]")
    try {
      // Wait for both executor JVMs to register (driver excluded).
      val deadline = System.currentTimeMillis + 60000
      while (cs.sparkContext.getExecutorMemoryStatus.size < 3 &&
          System.currentTimeMillis < deadline) Thread.sleep(250)
      val execs = cs.sparkContext.getExecutorMemoryStatus.size - 1
      require(execs >= 2, s"expected 2 executor JVMs, got $execs")
      println(s"[cluster] $execs executor JVMs registered")

      // Injected task retry: first attempt of partition 3 dies; the retry
      // must produce the exact deterministic sum. local[N] would fail the
      // whole job here (maxFailures=1 in local mode).
      val n = 100000L
      val sum = cs.sparkContext.parallelize(0L until n, 8)
        .mapPartitions { it =>
          val tc = org.apache.spark.TaskContext.get()
          if (tc.partitionId() == 3 && tc.attemptNumber() == 0)
            throw new RuntimeException("injected first-attempt task failure")
          it
        }.sum().toLong
      require(sum == n * (n - 1) / 2,
        s"task-retry sum mismatch: $sum vs ${n * (n - 1) / 2}")
      println("[cluster] task retry determinism OK (injected attempt-0 failure)")

      // XLSX distributed path: > 8 MB forces executor byte-scans of the
      // scratch-inflated sheet from non-driver JVMs.
      val xlsx = s"$work/ptp.xlsx"
      graft.io.SyntheticXlsx.writeNcciPtp(xlsx, 300000)
      val sizeMb = new java.io.File(xlsx).length / 1e6
      require(new java.io.File(xlsx).length > 8 * 1024 * 1024,
        f"xlsx fixture only $sizeMb%.1f MB - below the distributed threshold")
      val xlsxRows = graft.io.FileReader.readXlsx(cs, xlsx).count()
      println(f"[cluster] xlsx distributed read: $xlsxRows rows " +
        f"($sizeMb%.1f MB, executor scratch scans) OK")

      val clusterResults = runQueries(cs)
      println(s"[cluster] ${queryNames.size} queries ran on local-cluster")

      cs.stop()
      // The stopped session's state must not leak into the next builder.
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()

      // ---- Phase B: same queries, single-JVM local mode ----------------
      val ls = session("local[8]")
      try {
        val localResults = runQueries(ls)
        val localXlsxRows = graft.io.FileReader.readXlsx(ls, xlsx).count()
        require(localXlsxRows == xlsxRows,
          s"xlsx rows differ: cluster $xlsxRows vs local $localXlsxRows")
        queryNames.foreach { name =>
          require(clusterResults(name) == localResults(name),
            s"$name differs between local-cluster and local: " +
              s"${clusterResults(name).size} vs ${localResults(name).size} rows")
          println(s"[cluster] $name: ${localResults(name).size} rows, " +
            "local-cluster == local OK")
        }
      } finally ls.stop()
      println(f"[cluster] ALL GREEN in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } finally if (!cs.sparkContext.isStopped) cs.stop()
  }
}
