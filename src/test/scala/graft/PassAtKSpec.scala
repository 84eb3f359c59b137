package graft

import java.nio.file.Files

/** Round-15 pins for the pass@k eval estimator (q_llm_pass_at_k): a
  * hand-derived corpus where every combinatorial branch fires — the
  * exact telescoped-product ratio, the n−c<k certain-pass
  * short-circuit, the <10-trial exclusion, and the 40-trial cap. */
class PassAtKSpec extends SparkSpecBase {

  private val PASS = 150.0 // 15 000 cents — clears the 10 000 gate
  private val FAIL = 5.0 //     500 cents

  test("hand corpus: exact hypergeometric branches, cap, exclusion") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-passk").toString
    // user 1: n=12, c=3  -> p1 = 10000 - 9*10000 div 12        = 2500
    //                       p5 = 10000 - 15120*10000 div 95040 = 8410
    //                       p10: n-c = 9 < 10 -> certain pass  = 10000
    // user 2: n=10, c=0  -> 0 at every k (all-fail never passes)
    // user 3: n=9        -> excluded (fewer than 10 trials)
    // user 4: 45 events, the ONLY passes at positions 41-45 -> the
    //         40-trial cap must drop them (c=0); a broken cap would
    //         shift every k's mean.
    val u1 = (1 to 12).map(i =>
      (100L + i, i * 1000000000L, 1L, if (i <= 3) PASS else FAIL))
    val u2 = (1 to 10).map(i => (200L + i, i * 1000000000L, 2L, FAIL))
    val u3 = (1 to 9).map(i => (300L + i, i * 1000000000L, 3L, PASS))
    val u4 = (1 to 45).map(i =>
      (400L + i, i * 1000000000L, 4L, if (i > 40) PASS else FAIL))
    (u1 ++ u2 ++ u3 ++ u4).toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q_llm_pass_at_k")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // means over users {1, 2, 4}: k=1 (2500+0+0) div 3, k=5
    // (8410+0+0) div 3, k=10 (10000+0+0) div 3.
    assert(rows(1L) == ((3L, 833L, 0L, 2500L)))
    assert(rows(5L) == ((3L, 2803L, 0L, 8410L)))
    assert(rows(10L) == ((3L, 3333L, 0L, 10000L)))
  }

  test("pass@k is monotone in k and bounded by [c/n grain, 10000]") {
    val df = SparkEntry.queries("q_llm_pass_at_k")(
      spark, "/root/testdata/sf0.001")
    val byK = df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byK.keySet == Set(1L, 5L, 10L))
    // More draws can only help: mean pass@1 <= pass@5 <= pass@10.
    assert(byK(1L) <= byK(5L) && byK(5L) <= byK(10L))
    byK.values.foreach(v => assert(v >= 0L && v <= 10000L))
  }
}
