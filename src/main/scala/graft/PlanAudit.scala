package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of selected queries
  * so pushdown / broadcast / codegen can be inspected and tracked.
  * Usage: runMain graft.PlanAudit [queryName ...] (default: headline set). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(defaultCpus = 8)
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_agg1_pricing_summary", "q_j_broadcast_dims", "q_j1_lateral_top1",
      "q_d1_dedup_first_wins", "q_llm_ann_brute", "q_p6_status_filter")
    for (n <- names) {
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
