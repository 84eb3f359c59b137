package graft

import java.nio.file.Files

/** Round-14 wave-21 pins: empirical-Bayes shrinkage (the rank-flip
  * that is the operator's point, against a BigInt replay) and the
  * semdedup recipe eval (full capture on a constructed corpus where
  * both pairing branches are exercised). */
class EbShrinkSemEvalSpec extends SparkSpecBase {

  test("eb shrink: small perfect nation loses rank 1 to the large steady one") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-eb").toString
    // Nation 1: 3 customers, all active. Nation 2: 300 customers, 210
    // active. Nation 3: 50 customers, none active.
    val cust =
      (0 until 3).map(i => (1000L + i, 1L)) ++
      (0 until 300).map(i => (2000L + i, 2L)) ++
      (0 until 50).map(i => (9000L + i, 3L))
    cust.toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val activeKeys = (0 until 3).map(i => 1000L + i) ++
      (0 until 210).map(i => 2000L + i)
    activeKeys.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_stats_eb_shrink")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // Independent replay.
    val data = Map(1L -> ((3L, 3L)), 2L -> ((300L, 210L)), 3L -> ((50L, 0L)))
    val nn = BigInt(353); val xx = BigInt(213)
    data.foreach { case (nat, (n, x)) =>
      val raw6 = x * 1000000 / n
      val shrunk6 =
        ((BigInt(x) * nn + 100 * xx) * 1000000 / (nn * (n + 100))).toLong
      val (gn, gx, graw, gshrunk, _, _) = got(nat)
      assert((gn, gx) == ((n, x)))
      assert(graw == raw6, s"raw6($nat)")
      assert(gshrunk == shrunk6, s"shrunk6($nat)")
    }
    assert(got(1L)._5 == 1L, "raw ranking: the 3/3 nation leads")
    assert(got(2L)._6 == 1L, "shrunk ranking: the 210/300 nation leads")
    assert(got(1L)._6 == 2L, "the tiny perfect nation drops to 2nd")
  }

  test("semdedup eval: full capture on a corpus exercising both branches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sde").toString
    // 60 well-spread deterministic vectors; the query itself plants the
    // 19 replica pairs and the 47-member mega-clique from vec_id < 20.
    val rows = (0L until 60L).map { id =>
      (id, (0 until 64).map(j =>
        (((id * 31 + j * 7) % 97).toFloat - 48f) / 48f).toArray)
    }
    rows.toDF("vec_id", "embedding")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("q_llm_semdedup_eval")(spark, dir).collect()(0)
    assert(r.getLong(0) == 19L + 47L * 46 / 2, "n_truth")
    // The 19 replica pairs go through the capped all-pairs branch and
    // are all captured. The 47-clique exceeds maxCluster=40 inside one
    // sign-LSH bucket and degrades to the O(n) id-ordered chain. With
    // the NEGATIVE planted namespace (r16: twins -(i+1), mega copies
    // -(20001+r)) the clique is CONTIGUOUS in chain order — real
    // corpus ids are >= 0, so an interloper sharing the bucket can only
    // trail the clique (0 → interloper is the one link that fails, and
    // 0 is already chained to -1), never split it. Under the old
    // positive offsets an interloper landed between 0 and 10000 and
    // cost vector 0 its 46 clique pairs (1054/1100) — contiguity at
    // any corpus scale is exactly why planted ids moved to the
    // negative space. The chain fallback's bounded link budget (the
    // O(n) degrade itself) stays pinned by SemDedupSpec.
    assert(r.getLong(1) == 1100L, "contiguous negative-id chain captures all")
    assert(r.getLong(2) == 10000L, "recall_bp")
    assert(r.getLong(3) == 20L, "19 pair components + 1 mega component")
    assert(r.getLong(4) == 47L, "mega component complete")
  }
}
