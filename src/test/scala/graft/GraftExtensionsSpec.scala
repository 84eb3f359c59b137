package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** The SQL surface for native expressions must agree with the Column API.
  * Registration goes into an isolated child session (same SparkContext,
  * own function registry) — never stop or rebuild the shared session. */
class GraftExtensionsSpec extends SparkSpecBase {

  test("rolling_hash64 is callable from SQL and matches the Column API") {
    import spark.implicits._
    val s2 = spark.newSession()
    Bridge.registerFunction(s2, "rolling_hash64",
      exprs => graft.expressions.RollingHash64(exprs.head))
    val viaSql = s2.sql(
      "SELECT rolling_hash64(array('one', 'two', 'three')) AS h")
      .head.getLong(0)
    val viaColumn = Seq("one two three").toDF("v")
      .select(graft.llm.TextAnalysis.rollingHash(col("v")).as("h"))
      .head.getLong(0)
    assert(viaSql == viaColumn)
    // the parent session's registry is untouched
    intercept[Exception] {
      spark.sql("SELECT rolling_hash64(array('x'))").collect()
    }
  }

  test("the extensions hook injects the same builder") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.expressions.GraftExtensions().apply(exts) // must not throw
  }

  test("deflate_len is callable from SQL and matches the Column API") {
    import spark.implicits._
    val s2 = spark.newSession()
    Bridge.registerFunction(s2, "deflate_len",
      exprs => graft.expressions.DeflateLen(exprs.head))
    val viaSql = s2.sql(
      "SELECT deflate_len('abcabcabcabcabcabc') AS n").head.getInt(0)
    val viaColumn = Seq("abcabcabcabcabcabc").toDF("v")
      .select(graft.llm.TextAnalysis.deflateLen(col("v"))).head.getInt(0)
    assert(viaSql == viaColumn && viaSql > 0)
  }

  test("float_dot is callable from SQL and matches Similarity.dot") {
    import spark.implicits._
    val s2 = spark.newSession()
    Bridge.registerFunction(s2, "float_dot",
      exprs => graft.expressions.FloatDot(exprs.head, exprs(1)))
    val viaSql = s2.sql(
      "SELECT float_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head.getDouble(0)
    val viaColumn = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(graft.llm.Similarity.dot(col("a"), col("b"))).head.getDouble(0)
    assert(viaSql == 32.0 && viaColumn == 32.0)
  }
}
