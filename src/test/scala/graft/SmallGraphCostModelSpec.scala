package graft

import graft.operators.SmallGraph
import org.apache.spark.sql.functions._

/** Per-operator kernel cost model (r17, VERDICT r16 item 5): the flat
  * byte gate was a latency cliff — 256 MB is a fine LINEAR pass in one
  * task but O(m^1.5) of wedge work. A relation sized between the two
  * ceilings must route DISTRIBUTED for the superlinear kernels (ktruss,
  * triangles, wedge family, per-seed BFS sweeps) while still kerneling
  * the linear-pass operators (pagerank et al.); the global config
  * override and the size-only string-id gate keep their contracts.
  * Everything here is optimizer-estimate-only — no job runs. */
class SmallGraphCostModelSpec extends SparkSpecBase {

  // ~10M rows of two longs: the Range leaf estimate (~80 MB) sits above
  // SuperlinearMaxBytes (64 MB) and below DefaultMaxBytes (256 MB).
  // Nothing is ever executed - the gate reads plan stats only.
  private def midEdges = spark.range(10L * 1000 * 1000)
    .select(col("id").as("lo"), (col("id") + 1).as("hi"))

  test("mid-size relation: linear gate kernels, superlinear gate routes " +
      "distributed (ktruss-class vs pagerank-class)") {
    val est = midEdges.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    assert(est > BigInt(SmallGraph.SuperlinearMaxBytes) &&
      est <= BigInt(SmallGraph.DefaultMaxBytes),
      s"fixture estimate $est must sit between the ceilings")
    assert(SmallGraph.smallEnough(midEdges, "lo", "hi"),
      "linear-pass ceiling (pagerank class) must still kernel")
    assert(!SmallGraph.smallEnoughScaled(midEdges,
      SmallGraph.SuperlinearMaxBytes, "lo", "hi"),
      "superlinear ceiling (ktruss class) must route distributed")
  }

  test("graft.graph.smallKernelMaxBytes overrides BOTH ceilings") {
    try {
      spark.conf.set("graft.graph.smallKernelMaxBytes", (1L << 30).toString)
      assert(SmallGraph.smallEnoughScaled(midEdges,
        SmallGraph.SuperlinearMaxBytes, "lo", "hi"))
      spark.conf.set("graft.graph.smallKernelMaxBytes", "1024")
      assert(!SmallGraph.smallEnough(midEdges, "lo", "hi"))
    } finally spark.conf.unset("graft.graph.smallKernelMaxBytes")
  }

  test("smallEnoughAnyKey: string ids pass the size-only gate, and the " +
      "smallKernel=false escape hatch still wins") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    assert(SmallGraph.smallEnoughAnyKey(e))
    assert(!SmallGraph.smallEnough(e, "src", "dst"),
      "Long-key gate must refuse string ids")
    try {
      spark.conf.set("graft.graph.smallKernel", "false")
      assert(!SmallGraph.smallEnoughAnyKey(e))
    } finally spark.conf.unset("graft.graph.smallKernel")
  }
}
