package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Skew

/** Salted skew-mitigation specs: the two-stage forms must be EXACTLY equal
  * to the direct aggregation/join on a skewed key distribution. */
class SkewSpec extends SparkSpecBase {

  private def skewed() = {
    import spark.implicits._
    // 90% of rows share one hot key
    (0 until 2000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
      .toDF("k", "v")
  }

  test("salted count equals direct count per key") {
    val df = skewed()
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, Seq("k"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted sum equals direct sum per key") {
    val df = skewed()
    val direct = df.groupBy("k").agg(sum("v").as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(df, Seq("k"), col("v"), salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    import spark.implicits._
    val left = skewed()
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "B")).toDF("k", "label")
    val direct = left.join(dim, "k").groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(left, dim, "k", salts = 8)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }
}
