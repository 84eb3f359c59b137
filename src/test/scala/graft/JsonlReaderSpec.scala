package graft

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.io.JsonlReader

/** JSONL reader specs: schema-driven reads, missing fields, and the
  * quarantine-not-crash behavior on malformed lines. */
class JsonlReaderSpec extends SparkSpecBase {

  private def write(lines: String*): String = {
    val p = java.nio.file.Files.createTempFile("graft-jsonl-spec", ".jsonl")
    java.nio.file.Files.write(p,
      lines.mkString("", "\n", "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    p.toString
  }

  test("explicit schema: fields project by name, missing fields are NULL") {
    val path = write(
      """{"a":1,"b":"x"}""",
      """{"b":"y","a":2}""",   // field order must not matter
      """{"a":3}""")
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", StringType)))
    val rows = JsonlReader.read(spark, path, Some(schema))
      .orderBy("a").collect().map(r => (r.get(0), r.get(1)))
    assert(rows.toSeq == Seq((1L, "x"), (2L, "y"), (3L, null)))
  }

  test("a malformed line lands in _corrupt instead of failing the read") {
    val path = write("""{"a":1}""", """not json at all""", """{"a":3}""")
    val schema = StructType(Seq(StructField("a", LongType), StructField("_corrupt", StringType)))
    val df = JsonlReader.read(spark, path, Some(schema))
    assert(df.count() == 3)
    val corrupt = df.filter(df("_corrupt").isNotNull).collect()
    assert(corrupt.length == 1 && corrupt.head.getAs[String]("_corrupt") == "not json at all")
  }
}
