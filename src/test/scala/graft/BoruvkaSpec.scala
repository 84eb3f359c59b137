package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Wave-19 pins: Borůvka MSF — hand graphs with known unique forests
  * (triangle cycle exclusion, tie-break by (d, lo, hi), multi-round
  * chain merging with pointer jumping) and the registry query end to
  * end on a constructed co-purchase corpus. */
class BoruvkaSpec extends SparkSpecBase {

  private def msf(edges: Seq[(Long, Long, Long)],
                  maxDriverEdges: Long = 0L): Set[(Long, Long, Long)] = {
    import spark.implicits._
    // maxDriverEdges = 0 forces the DISTRIBUTED Borůvka rounds — the
    // 100 TB path — so these hand graphs pin hook/pointer-jump logic,
    // not just driver Kruskal.
    graft.operators.Boruvka.msfEdges(edges.toDF("lo", "hi", "d"),
        maxDriverEdges = maxDriverEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("triangle drops its heaviest edge; ties break by (d, lo, hi)") {
    val got = msf(Seq((1L, 2L, 1L), (2L, 3L, 2L), (1L, 3L, 3L),
      (4L, 5L, 1L), (5L, 6L, 5L), (4L, 6L, 5L)))
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 2L), (4L, 5L, 1L),
      (4L, 6L, 5L)), "second triangle's d=5 tie must pick lo=4")
  }

  test("8-cycle: multi-round merge keeps all but the heaviest edge") {
    // Alternating 1/10 weights force 4 two-node hooks in round 1, then
    // chain merges (pointer-jumping depth > 1) in later rounds.
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 10L), (3L, 4L, 1L), (4L, 5L, 10L),
      (5L, 6L, 1L), (6L, 7L, 10L), (7L, 8L, 1L), (1L, 8L, 20L))
    val got = msf(cyc)
    assert(got == cyc.init.toSet, "exclude exactly the weight-20 closer")
  }

  test("empty edge relation yields an empty forest") {
    assert(msf(Seq.empty) == Set.empty)
  }

  test("driver Kruskal path is bit-identical to the distributed rounds") {
    val cyc = Seq((1L, 2L, 1L), (2L, 3L, 10L), (3L, 4L, 1L), (4L, 5L, 10L),
      (5L, 6L, 1L), (6L, 7L, 10L), (7L, 8L, 1L), (1L, 8L, 20L),
      (4L, 6L, 5L), (4L, 6L, 5L + 0L))
    // Duplicate (4,6,5) rows collapse identically on both paths; the
    // unique-forest contract under (d, lo, hi) makes the two
    // implementations interchangeable.
    val dedup = cyc.distinct
    assert(msf(dedup, maxDriverEdges = Long.MaxValue) ==
      msf(dedup, maxDriverEdges = 0L))
  }

  test("registry q_graph_msf: constructed co-purchase corpus, hand forest") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-msf").toString
    // Orders over mod-4 parts: (4,8) co-purchased twice (one order with a
    // duplicate lineitem that collect_set must dedup), (8,12) once,
    // (4,12) once (ties with (8,12) at w=1 → (4,12) wins by lo), and an
    // isolated pair (16,20). Odd parts must be invisible.
    val rows = Seq(
      (1L, 4L), (1L, 8L), (1L, 4L),
      (2L, 4L), (2L, 8L),
      (3L, 8L), (3L, 12L),
      (4L, 4L), (4L, 12L),
      (5L, 16L), (5L, 20L),
      (6L, 7L), (6L, 11L))
    rows.toDF("l_orderkey", "l_partkey")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    spark.conf.set("graft.graph.sideTable", "false")
    try {
      val got = SparkEntry.queries("q_graph_msf")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      // tree {16,20}: size 2, weight 1, 1 edge, root 16;
      // tree {4,8,12}: size 3, weight 2+1 = 3, 2 edges, root 4.
      assert(got == Seq((2L, 1L, 1L, 1L, 16L), (3L, 1L, 3L, 2L, 4L)))
    } finally spark.conf.unset("graft.graph.sideTable")
  }

  test("forest invariant: every tree has size-1 edges at sf0.001") {
    val got = SparkEntry.queries("q_graph_msf")(
      spark, "/root/testdata/sf0.001").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) * (r.getLong(0) - 1),
        s"edge_sum must be n_trees*(tree_size-1) at size ${r.getLong(0)}")
    }
  }
}
