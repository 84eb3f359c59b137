package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual registered queries in isolation
  * (`runMain graft.TimeOne <sfDir> <queryName>...`), with the same session
  * config as Bench. Repeating a name shows cold-vs-warm cost. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    graft.queries.Registry.warmSharedStore(spark)
    for (n <- names) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[time] $n rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
