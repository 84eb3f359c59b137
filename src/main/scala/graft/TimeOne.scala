package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries in isolation
  * (`runMain graft.TimeOne <sfDir> <queryName>...`), with the same session
  * config as Bench. Repeating a name shows cold-vs-warm cost. Pass
  * `--clear` before the names to clearCache between queries (Bench's
  * discipline) — the lever for bisecting cross-query cache-reuse effects. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val clear = args.contains("--clear")
    val names = args.drop(1).filterNot(_ == "--clear")
    val spark = Sessions.local(defaultCpus = 32)
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.Registry.warmSharedStore(spark)
    for (n <- names) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (clear) spark.catalog.clearCache()
    }
    spark.stop()
  }
}
