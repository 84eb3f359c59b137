package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main mirroring the driver's t1 check: run the flagship
  * entry() and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(false)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
