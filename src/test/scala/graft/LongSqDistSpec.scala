package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** LongSqDist: the native codegen'd squared-L2 kernel must be
  * bit-identical to the aggregate(zip_with(...)) lambda fold it
  * replaced — including the null/length-mismatch poisoning contract —
  * and reachable from SQL. */
class LongSqDistSpec extends SparkSpecBase {

  private def native = graft.llm.DetKMeans.dist2 _
  private def lambda = graft.llm.DetKMeans.dist2Lambda _

  test("native == lambda on deterministic pseudo-random 64-dim arrays") {
    import spark.implicits._
    // md5-free xorshift-ish determinism: values from (i·2654435761) mod M
    val rows = (0 until 200).map { r =>
      def v(seed: Int): Seq[Long] =
        (0 until 64).map(i =>
          (((r * 64 + i + seed).toLong * 2654435761L) % 20000001L)
            - 10000000L)
      (v(0), v(7919))
    }
    val df = rows.toDF("a", "b")
      .select(native(col("a"), col("b")).as("n"),
        lambda(col("a"), col("b")).as("l"))
    assert(df.filter(col("n") =!= col("l")).count() == 0)
    assert(df.filter(col("n").isNull).count() == 0)
  }

  test("length mismatch and null elements poison to NULL like zip_with") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L)),
      (Seq(1L, 2L), Seq(1L, 2L))).toDF("a", "b")
    val out = df.select(native(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) == 0L)
    val withNullElem = spark.sql(
      "SELECT array(1L, CAST(NULL AS BIGINT)) AS a, array(1L, 2L) AS b")
    assert(withNullElem
      .select(native(col("a"), col("b")).as("d")).collect()(0).isNullAt(0))
  }

  test("mixed int/long sides widen exactly") {
    val df = spark.sql("SELECT array(1, 2, 3) AS a, array(3L, 1L, 7L) AS b")
    assert(df.select(native(col("a"), col("b")).as("d"))
      .collect()(0).getLong(0) == (4L + 1L + 16L))
  }

  test("SQL surface: long_sq_dist registers and matches the Column API") {
    Bridge.registerFunction(spark, "long_sq_dist",
      exprs => graft.expressions.LongSqDist(exprs.head, exprs(1)))
    val r = spark.sql(
      "SELECT long_sq_dist(array(1L, 5L), array(4L, 1L)) AS d").collect()
    assert(r(0).getLong(0) == 25L)
  }
}
