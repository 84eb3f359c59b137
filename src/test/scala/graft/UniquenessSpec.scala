package graft

import java.nio.file.Files

/** Round-15 pins for the QI uniqueness audit (q_gov_uniqueness):
  * hand-built customer table where every subset's class/singleton counts
  * are derivable by inspection, and the monotonicity law (adding a QI
  * column can never DECREASE singletons) on the real corpus. */
class UniquenessSpec extends SparkSpecBase {

  test("hand table: per-subset classes, singletons, risk") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-uniq").toString
    // 4 rows: nat 0/0/1/1, seg A/A/A/B, acctbal 0 (one bal band).
    // nat:       classes {0:2, 1:2}            -> 0 singletons
    // seg:       classes {A:3, B:1}            -> 1 singleton
    // bal:       one class of 4                -> 0
    // nat+seg:   {(0,A):2, (1,A):1, (1,B):1}   -> 2 singletons
    // nat+bal:   same as nat                   -> 0
    // seg+bal:   same as seg                   -> 1
    // all three: same as nat+seg               -> 2
    Seq((1L, 0L, "A", 0.0), (2L, 0L, "A", 0.0),
        (3L, 1L, "A", 0.0), (4L, 1L, "B", 0.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = SparkEntry.queries("q_gov_uniqueness")(spark, dir).collect()
      .map(r => r.getString(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got("nat+seg+bal") == ((3L, 4L, 2L, 5000L)))
    assert(got("nat+seg") == ((3L, 4L, 2L, 5000L)))
    assert(got("nat+bal") == ((2L, 4L, 0L, 0L)))
    assert(got("nat") == ((2L, 4L, 0L, 0L)))
    assert(got("seg+bal") == ((2L, 4L, 1L, 2500L)))
    assert(got("seg") == ((2L, 4L, 1L, 2500L)))
    assert(got("bal") == ((1L, 4L, 0L, 0L)))
  }

  test("real corpus: singletons monotone under QI refinement") {
    val rows = SparkEntry.queries("q_gov_uniqueness")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    // gid bit = column ROLLED UP, so gid A refines gid B iff A's bits
    // are a subset of B's. Refinement splits classes: singletons can
    // only grow.
    for (a <- 0L to 6L; b <- 0L to 6L
         if a != b && (a & b) == a) // a groups by a superset of b's QIs
      assert(rows(a) >= rows(b),
        s"gid $a (finer) has fewer singletons than gid $b (coarser)")
  }
}
