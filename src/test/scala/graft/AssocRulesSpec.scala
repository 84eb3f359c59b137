package graft

import java.nio.file.Files

/** Hand-computed pins for the market-basket rules query — the oracle
  * replays the same joins, so these fixtures pin the DEFINITIONS:
  * set-semantics basket membership, the min-support cut, directional
  * confidence, and the nested truncating lift surface. */
class AssocRulesSpec extends SparkSpecBase {

  test("brand pair above min-support gets hand-computed conf/lift; " +
      "below-support pair is cut; duplicate lines collapse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-assoc").toString
    Seq((1L, "Brand#A"), (2L, "Brand#B"), (3L, "Brand#C"))
      .toDF("p_partkey", "p_brand").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    // 30 baskets {A,B} (one with a duplicated A line), 10 {A,C},
    // 10 {B}, 10 {C} -> 60 baskets; A in 40, B in 40, C in 20.
    val li = (0L until 30L).flatMap(i =>
        Seq((i, 1L), (i, 2L)) ++ (if (i == 0) Seq((i, 1L)) else Nil)) ++
      (30L until 40L).flatMap(i => Seq((i, 1L), (i, 3L))) ++
      (40L until 50L).map(i => (i, 2L)) ++
      (50L until 60L).map(i => (i, 3L))
    li.toDF("l_orderkey", "l_partkey").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = SparkEntry.queries("q_mb_assoc_rules")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // (A,C) pair_n = 10 < 20 -> cut. conf4(A->B) = 30*10^4 div 40 = 7500;
    // lift4 = 7500*60 div 40 = 11250 both ways (symmetric counts).
    assert(out == Seq(
      ("Brand#A", "Brand#B", 30L, 7500L, 11250L),
      ("Brand#B", "Brand#A", 30L, 7500L, 11250L)))
  }
}
