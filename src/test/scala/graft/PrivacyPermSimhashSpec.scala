package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Round-14 pins: recursive (c,l)-diversity semantics, the randomization
  * test's two degenerate poles, and the SimHash banding's recall
  * completeness. */
class PrivacyPermSimhashSpec extends SparkSpecBase {

  test("cl-diversity: single-valued class violates with the sentinel " +
      "margin; a 3:2 class is (3,2)-diverse") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cldiv").toString
    // Class nat=1: 4 orders, ALL 1-URGENT -> r1=4, tail=0 -> sentinel,
    // violates. Class nat=2: 3x 1-URGENT + 2x 2-HIGH -> r1=3, tail=2,
    // margin 15000, 3 < 3*2 -> diverse.
    Seq((1L, 1, "BUILDING", 0.0), (2L, 1, "BUILDING", 0.0),
        (3L, 2, "BUILDING", 0.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .repartition(1).write.parquet(s"$dir/customer.parquet")
    Seq((1L, "1-URGENT"), (1L, "1-URGENT"), (2L, "1-URGENT"),
        (2L, "1-URGENT"),
        (3L, "1-URGENT"), (3L, "1-URGENT"), (3L, "1-URGENT"),
        (3L, "2-HIGH"), (3L, "2-HIGH"))
      .toDF("o_custkey", "o_orderpriority")
      .repartition(1).write.parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_gov_cl_diversity")(spark, dir)
      .collect().map(r => (r.getAs[Long]("nat"), r.getAs[Long]("n_c"),
        r.getAs[Long]("r1"), r.getAs[Long]("margin_bp"),
        r.getAs[Long]("violates_c3"), r.getAs[Long]("rk"),
        r.getAs[Long]("n_violating")))
    assert(got.toSeq == Seq(
      (1L, 4L, 4L, 100000000L, 1L, 1L, 1L),
      (2L, 5L, 3L, 15000L, 0L, 2L, 1L)))
  }

  test("perm test: identical am/pm samples give p = 1.0 exactly; a " +
      "gross separation gives small p") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-perm").toString
    val dayMs = 86400000L
    def ev(id: Long, day: Int, hour: Int, typ: String, v: Double) =
      (id, new Timestamp(day * dayMs + hour * 3600000L), 1L, typ, v)
    // "flat": am == pm every day -> obs_cross = 0 -> EVERY relabeling is
    // extreme -> p_micro = 201e6 div 201 = 1000000.
    val flat = (0 until 6).flatMap(d => Seq(
      ev(d * 2L, d, 6, "flat", 5.0), ev(d * 2L + 1, d, 18, "flat", 5.0)))
    // "split": am huge, pm tiny over 20 days -> only the near-identity
    // relabelings reach the observed separation.
    val split = (0 until 20).flatMap(d => Seq(
      ev(1000L + d * 2, d, 6, "split", 1000.0),
      ev(1001L + d * 2, d, 18, "split", 1.0)))
    (flat ++ split)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_stats_perm_test")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("obs_cross"), r.getAs[Long]("p_micro")))).toMap
    assert(got("flat") == ((0L, 1000000L)),
      s"flat sample should be maximally insignificant: ${got("flat")}")
    assert(got("split")._1 > 0 && got("split")._2 < 100000,
      s"gross separation should be significant: ${got("split")}")
  }

  test("simhash eval: banding is recall-complete at radius 3 " +
      "(pigeonhole) and the sf0.001 scores are pinned") {
    val row = SparkEntry.queries("q_llm_simhash_eval")(
      spark, "/root/testdata/sf0.001").head
    // 4 bands x 15 bits: a pair within Hamming <= 3 differs in at most 3
    // bands, so it shares at least one -> recall over the planted truth
    // MUST be 10000 whatever the corpus.
    assert(row.getAs[Long]("recall4") == 10000L)
    assert((row.getAs[Long]("n_cand"), row.getAs[Long]("n_within3"),
      row.getAs[Long]("precision4"), row.getAs[Long]("n_truth"),
      row.getAs[Long]("mean_ham_x100")) == ((37L, 20L, 5405L, 4L, 413L)))
  }
}
