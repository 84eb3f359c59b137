package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: the classic clickstream shape — a new
  * session starts when the gap to the user's previous event exceeds a
  * threshold. This is the batch twin of the streaming surface
  * (`streaming/EventStream.sessionize*` / `session_window`): identical
  * semantics, expressed as two per-user windows so Catalyst plans one
  * shuffle on the user key and everything else stays partition-local.
  *
  * Scale shape: both windows partition by user (no global window), so the
  * relation shuffles once by user and session assignment is embarrassingly
  * parallel across users; a power user's event list is the only per-key
  * hotspot, the same bound the streaming variant has. */
object Sessionize {

  /** Events plus a 0-based `session_id` per user. Ordering inside a user is
    * (ts, tie) — pass a unique tie-break column so runs are deterministic
    * under equal timestamps. `gap` compares in the ts column's own unit. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             tieCol: String, gap: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val starts = when(prevTs.isNull, 0L)
      .when(col(tsCol) - prevTs > gap, 1L).otherwise(0L)
    events.withColumn("session_id", sum(starts).over(running))
  }

  /** Per-user session stats: event count, session count, and the largest
    * session's event count. */
  def userStats(events: DataFrame, userCol: String, tsCol: String,
                tieCol: String, gap: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gap)
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(userCol))
      .agg(sum(col("_n")).cast("long").as("n_events"),
        count(lit(1)).as("n_sessions"),
        max(col("_n")).cast("long").as("max_session_events"))
}
