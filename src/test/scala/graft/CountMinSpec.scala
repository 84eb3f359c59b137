package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMinSketch

class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def stream(items: String*) = items.toDF("tok")

  test("estimates never underestimate; absent items may only overestimate") {
    val s = stream(Seq.fill(50)("a") ++ Seq.fill(7)("b") ++ Seq("c"): _*)
    val counters = CountMinSketch.buildCounters(s, "tok", depth = 4, width = 64)
    val est = CountMinSketch.estimates(counters,
        Seq("a", "b", "c", "missing").toDF("item"), "item",
        depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") >= 50L && est("b") >= 7L && est("c") >= 1L)
    assert(est("missing") >= 0L) // only collisions can lift it above 0
    // At width 64 with 3 distinct items, at least one row avoids every
    // collision, so the min recovers the exact counts.
    assert(est("a") == 50L && est("b") == 7L)
  }

  test("counters are linear: union + re-aggregate equals one-shot build") {
    val s1 = stream(Seq.fill(10)("x") ++ Seq.fill(3)("y"): _*)
    val s2 = stream(Seq.fill(5)("x") ++ Seq.fill(8)("z"): _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val merged = CountMinSketch.buildCounters(s1, "tok")
      .unionByName(CountMinSketch.buildCounters(s2, "tok"))
      .groupBy("row", "pos").agg(sum(col("cnt")).as("cnt"))
    val oneShot = CountMinSketch.buildCounters(s1.unionByName(s2), "tok")
    assert(canon(merged) == canon(oneShot))
  }

  test("sketch size is bounded by depth x width regardless of stream size") {
    val big = stream(Seq.tabulate(5000)(i => s"t${i % 400}"): _*)
    val counters = CountMinSketch.buildCounters(big, "tok", depth = 4, width = 32)
    assert(counters.count() <= 4L * 32L)
  }
}
