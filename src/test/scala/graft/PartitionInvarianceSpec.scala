package graft

/** The engine's determinism contract, actually exercised: every query's
  * scaladoc claims order-independent arithmetic (integer units, DECIMAL
  * sums, floor-before-sum), which implies results are BIT-IDENTICAL under
  * any partitioning. This spec re-runs representative queries — one per
  * arithmetic discipline — at shuffle widths 3 and 32 and compares
  * collected rows exactly. A violation here means a double sum leaked
  * into a hot path (the bug class the oracle can miss when both engines
  * happen to add in the same order at one width). */
class PartitionInvarianceSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  // One query per discipline: picorank integer units (pagerank), DECIMAL
  // money sums (pricing summary), floored-ln micro-units (JSD), exact
  // integer pair statistics (Mann-Kendall), md5-derived rank picks (KMV
  // at sf0.001 has <64 slots per type -> also pins the drop semantics),
  // and the next-fit packed-long fold (chunk sentences).
  private val queries = Seq("q_graph_pagerank", "q_agg1_pricing_summary",
    "q_llm_jsd", "q_stats_mann_kendall", "q_sketch_kmv",
    "q_llm_chunk_sentences")

  private def runAt(name: String, parts: Int): Seq[Seq[Any]] = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      graft.queries.Registry.configure(spark)
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toSeq).toSeq
        .sortBy(_.mkString("|")) // row order is not part of the contract
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  for (q <- queries)
    test(s"$q is bit-identical at shuffle widths 3 and 32") {
      assert(runAt(q, 3) == runAt(q, 32))
    }
}
