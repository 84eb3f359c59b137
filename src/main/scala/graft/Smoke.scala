package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main mirroring the driver's t1 check: run the flagship
  * entry() and require rows > 0. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(defaultCpus = 8)
    val df = SparkEntry.entry(spark)
    df.show(false)
    val n = df.count()
    println(s"[smoke] entry rows = $n")
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
