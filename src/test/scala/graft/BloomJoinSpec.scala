package graft

import org.apache.spark.sql.functions._

/** Round-15 pins for the Bloom semi-join reduction
  * ([[graft.operators.BloomJoin]]): the one-sided-error contract (a key
  * in the build set ALWAYS passes — the reduction can never drop a true
  * match), agreement with the exact semi-join modulo false positives
  * only, engine/oracle bit-position agreement, and determinism across
  * partitionings. */
class BloomJoinSpec extends SparkSpecBase {

  import graft.operators.BloomJoin

  test("no false negatives: every build key passes the filter") {
    import spark.implicits._
    val build = (0L until 500L).map(i => i * 37 % 10007).toDF("k")
    val (bits, m, k) = BloomJoin.buildBits(build, "k", fpp = 0.01)
    val misses = build
      .filter(!BloomJoin.mayContain(col("k"), bits, m, k)).count()
    assert(misses == 0, "a set key must always pass (one-sided error)")
  }

  test("reduce() output = exact matches + Bloom false positives only") {
    import spark.implicits._
    val probe = (0L until 2000L).toDF("pk")
    val build = Seq(3L, 500L, 999L, 1500L, 1999L).toDF("bk")
    val candidates = BloomJoin.reduce(probe, "pk", build, "bk", fpp = 0.05)
      .collect().map(_.getLong(0)).toSet
    val exact = probe.join(build, col("pk") === col("bk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(candidates), "candidates must cover every match")
    // Every extra candidate must be a genuine Bloom false positive: all k
    // positions set — re-verify with the driver-side position arithmetic.
    val (bits, m, k) = BloomJoin.buildBits(build, "bk", fpp = 0.05)
    (candidates -- exact).foreach { fp =>
      val allSet = (0 until k).forall { j =>
        val p = graft.expressions.MdBloom.position(j, fp.toString, m)
        (bits((p >> 6).toInt) & (1L << (p & 63).toInt)) != 0
      }
      assert(allSet, s"candidate $fp passed without all positions set")
    }
  }

  test("deterministic across partitionings (treeAggregate build)") {
    import spark.implicits._
    val build = (0L until 300L).map(i => i * 7 % 9973).toDF("k")
    val b1 = BloomJoin.buildBits(build.repartition(1), "k", fpp = 0.02)
    val b32 = BloomJoin.buildBits(build.repartition(32), "k", fpp = 0.02)
    assert(b1._2 == b32._2 && b1._3 == b32._3)
    assert(b1._1.toSeq == b32._1.toSeq, "bitset must not depend on layout")
  }

  test("q_j_bloom_semijoin: structural invariants at sf0.001") {
    val r = SparkEntry.queries("q_j_bloom_semijoin")(
      spark, "/root/testdata/sf0.001").head()
    val nProbe = r.getAs[Long]("n_probe")
    val nCand = r.getAs[Long]("n_candidates")
    val nMatch = r.getAs[Long]("n_matches")
    assert(r.getAs[Long]("false_negatives") == 0L)
    assert(nMatch <= nCand && nCand <= nProbe)
    assert(r.getAs[Long]("false_positives") == nCand - nMatch)
    assert(nMatch > 0, "threshold must keep a nonempty build side")
    assert(nCand < nProbe,
      "the reduction must actually reduce (selective build side)")
  }
}
