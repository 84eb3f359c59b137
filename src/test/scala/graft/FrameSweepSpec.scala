package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mechanical gate for the O(n²) window-frame class the round-16 sf1
  * sweep caught in the as-of joins: a frame whose END is
  * unbounded-following but whose START moves (e.g. current-row..
  * unbounded-following) executes as Spark's
  * UnboundedFollowingWindowFunctionFrame — a rescan to the partition
  * end for EVERY row, quadratic per key bucket. Invisible at test sf,
  * a cliff at sf1+ (q_asof_nearest: 0.3 s at sf0.1, >14 min at sf1).
  * Any such frame must be re-expressed as an incremental
  * unbounded-preceding frame over the REVERSED ordering (bit-identical;
  * see AsOfJoin). Frames with BOTH ends unbounded are fine (computed
  * once per partition), as are sliding and growing frames.
  *
  * The sweep walks the optimized plan of EVERY registered query at
  * sf0.001 — a reintroduction anywhere in the registry fails here, the
  * same reintroduction-gate pattern as FixturePlantingSpec. */
class FrameSweepSpec extends SparkSpecBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def shrinkingFrames(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case n => n }
      .flatMap(_.expressions)
      .flatMap(_.collect {
        case f @ SpecifiedWindowFrame(_, lo, UnboundedFollowing)
            if lo != UnboundedPreceding => f.sql
      })

  test("detector flags a current-row..unbounded-following frame") {
    import spark.implicits._
    val w = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val df = Seq((1, 1), (1, 2)).toDF("k", "t")
      .withColumn("c", last(col("t"), ignoreNulls = true).over(w))
    assert(shrinkingFrames(df).nonEmpty)
  }

  test("detector accepts unbounded-both and growing frames") {
    import spark.implicits._
    val base = Seq((1, 1), (1, 2)).toDF("k", "t")
    val whole = Window.partitionBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val grow = Window.partitionBy("k").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = base.withColumn("a", max(col("t")).over(whole))
      .withColumn("b", last(col("t")).over(grow))
    assert(shrinkingFrames(df).isEmpty)
  }

  test("no registered query plans a shrinking unbounded-following frame") {
    graft.queries.Registry.configure(spark)
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val frames =
          try shrinkingFrames(fn(spark, sfDir))
          catch { case e: Throwable =>
            fail(s"$name: plan construction failed: ${e.getMessage}")
          }
        frames.map(f => s"$name: $f")
    }
    assert(bad.isEmpty,
      s"quadratic UnboundedFollowing frames (re-express over the " +
        s"reversed ordering, see AsOfJoin):\n${bad.mkString("\n")}")
  }
}
