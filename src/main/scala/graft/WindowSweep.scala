package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** Mechanical scale gate for GLOBAL windows (VERDICT r12 item 2): a
  * `Window.orderBy(...)` with no partitioning executes on ONE task, so it
  * is only scale-safe when (a) Spark rewrites the rank-limit pattern to a
  * distributed `WindowGroupLimit` / `TakeOrderedAndProject`, or (b) the
  * window consumes a relation that stays BOUNDED as data grows
  * (histograms, daily bins, capped distinct-value panels). (a) was pinned
  * by example in PlanRegressionSpec; (b) was adjudicated by reading the
  * code. This main makes both mechanical across the whole registry:
  *
  *  - run every registered query at two scale factors (default sf0.001
  *    and sf0.01 — 10× the data),
  *  - walk the AQE-final physical plan for `WindowExec` nodes with an
  *    empty partitionSpec,
  *  - PASS structurally if the window's subtree carries a global
  *    `WindowGroupLimitExec` / `TakeOrderedAndProjectExec` / limit
  *    (rank-limit rewrite → map-side pruning bounds the input), else
  *  - PASS empirically iff the window's measured input cardinality (the
  *    records written into its single-partition exchange; fallback: the
  *    nearest descendant numOutputRows) is ≤ `AbsBound` rows at the
  *    larger SF AND grew ≤ `GrowthBound`× across the 10× data step —
  *    i.e. the relation is genuinely bounded, not merely small today.
  *
  * A silent regression — an edit that demotes a rank-limit rewrite to a
  * corpus-sized single-partition sort, or parks a global window on a
  * linearly-growing relation — fails the sweep by name. Run per wave on
  * new queries (subset args) and per round on the full registry:
  * `sbt "runMain graft.WindowSweep [sfDirA] [sfDirB] [q_name ...]"`. */
object WindowSweep {

  /** Bounded-relation ceiling at the larger sweep SF (sf0.01): every
    * adjudicated-benign global window there feeds ≤ ~10k rows (histogram
    * buckets, ≤ 31 daily bins, ≤ 10001-row capped panels); 100k leaves
    * headroom without admitting corpus-sized inputs (documents at sf0.01
    * is ~6k rows but grows 10× per SF step — the growth gate catches
    * what the absolute gate admits). */
  private val AbsBound = 100000L

  /** Max admissible input growth across the 10× data step: bounded
    * relations measure 1-5× (caps, fixed time spans, distinct-value
    * saturation); anything ≥ 6× tracks the corpus linearly. */
  private val GrowthBound = 6.0

  final case class GlobalWindow(detail: String, structurallyBounded: Boolean,
                                inputRows: Option[Long])

  /** AQE-aware tree walk: step through adaptive roots, materialized query
    * stages, and exchange reuse so the FINAL executed operators are seen. */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: children.flatMap(walk)
  }

  /** The window's measured input cardinality: records written into the
    * nearest single-partition shuffle beneath it (exact — a global window
    * reads exactly what its exchange wrote), else the nearest descendant
    * operator exposing numOutputRows. */
  private def inputRows(sub: Seq[SparkPlan]): Option[Long] = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val viaShuffle = sub.collectFirst {
      case s: ShuffleExchangeExec if s.metrics.contains("shuffleRecordsWritten") =>
        s.metrics("shuffleRecordsWritten").value
    }
    viaShuffle.orElse(sub.tail.collectFirst {
      case p if p.metrics.contains("numOutputRows") =>
        p.metrics("numOutputRows").value
    })
  }

  /** All global windows in an EXECUTED plan with their gate evidence. */
  def globalWindows(plan: SparkPlan): Seq[GlobalWindow] = {
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    import org.apache.spark.sql.execution.{TakeOrderedAndProjectExec, GlobalLimitExec, LocalLimitExec, CollectLimitExec}
    walk(plan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val sub = walk(w)
        val structural = sub.exists {
          case g: WindowGroupLimitExec => g.partitionSpec.isEmpty
          case _: TakeOrderedAndProjectExec | _: GlobalLimitExec |
               _: LocalLimitExec | _: CollectLimitExec => true
          case _ => false
        }
        GlobalWindow(w.windowExpression.map(_.sql).mkString(";").take(120),
          structural, inputRows(sub))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfA = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val sfB = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val only = args.drop(2).toSet
    val spark = Sessions.local(defaultCpus = 32)
    graft.queries.Registry.configure(spark)

    def run(name: String, dir: String): Either[String, Seq[GlobalWindow]] =
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        df.collect()
        Right(globalWindows(df.queryExecution.executedPlan))
      } catch {
        case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally spark.catalog.clearCache()

    var weak = 0
    var errs = 0
    var checked = 0
    val t0 = System.nanoTime()
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
      .foreach { name =>
        (run(name, sfA), run(name, sfB)) match {
          case (Right(a), Right(b)) =>
            checked += 1
            if (b.isEmpty) println(s"[wsweep] PASS $name (no global window)")
            else b.zipWithIndex.foreach { case (wb, i) =>
              val wa = a.lift(i)
              if (wb.structurallyBounded)
                println(s"[wsweep] PASS $name #$i rank-limit rewrite")
              else (wa.flatMap(_.inputRows), wb.inputRows) match {
                case (Some(ra), Some(rb)) =>
                  val ratio = if (ra == 0) (if (rb == 0) 1.0 else rb.toDouble)
                              else rb.toDouble / ra
                  val ok = rb <= AbsBound && ratio <= GrowthBound
                  if (ok)
                    println(f"[wsweep] PASS $name #$i bounded input " +
                      f"($ra -> $rb rows, ${ratio}%.1fx for 10x data)")
                  else {
                    weak += 1
                    println(f"[wsweep] WEAK $name #$i global window input " +
                      f"$ra -> $rb rows (${ratio}%.1fx) exceeds " +
                      f"bound ($AbsBound rows / ${GrowthBound}x): " +
                      wb.detail)
                  }
                case _ =>
                  weak += 1
                  println(s"[wsweep] WEAK $name #$i global window with NO " +
                    s"measurable input metric — extend the sweep: ${wb.detail}")
              }
            }
          case (l, r) =>
            errs += 1
            println(s"[wsweep] ERR  $name " +
              l.left.toOption.orElse(r.left.toOption).get)
        }
      }
    println(f"[wsweep] done: $checked queries, $weak weak, $errs errors, " +
      f"${(System.nanoTime() - t0) / 1e9}%.0f s ($sfA vs $sfB)")
    spark.stop()
    if (weak + errs > 0) sys.exit(1)
  }
}
