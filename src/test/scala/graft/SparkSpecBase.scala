package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs + single-value expression eval. */
trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpecBase.session

  /** Evaluate a Column expression over a single string input (null allowed);
    * returns null for SQL NULL. */
  def eval(input: String, f: Column => Column): Any = {
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(input)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType, nullable = true))))
    df.select(f(col("v")).as("r")).head.get(0)
  }
}

object SparkSpecBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
