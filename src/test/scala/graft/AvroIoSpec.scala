package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.io.AvroIo

class AvroIoSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("n", IntegerType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("name", StringType, nullable = true),
    StructField("ok", BooleanType, nullable = true)))

  private def tempDir() =
    java.nio.file.Files.createTempDirectory("graft-avro-spec").toString

  test("write/read roundtrip preserves values, nulls, and schema") {
    val rows = Seq(
      Row(1L, 10, 1.5, "alpha", true),
      Row(2L, null, -0.25, "béta", false),
      Row(3L, 30, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tempDir()
    AvroIo.write(df, dir)
    val back = AvroIo.read(spark, dir)
    assert(back.schema == schema)
    assert(back.orderBy("id").collect().toSeq == rows)
  }

  test("one container file per input partition; read reassembles all") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id").repartition(5)
    val dir = tempDir()
    AvroIo.write(df, dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 5)
    val back = AvroIo.read(spark, dir)
    assert(back.count() == 100)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 5050L)
  }

  test("schema mapping rejects unsupported nested types") {
    val bad = StructType(Seq(StructField("a",
      ArrayType(LongType), nullable = true)))
    intercept[IllegalArgumentException] { AvroIo.toAvroSchema(bad) }
  }

  test("avro<->spark schema mapping is an inverse pair") {
    assert(AvroIo.toSparkSchema(AvroIo.toAvroSchema(schema)) == schema)
  }
}
