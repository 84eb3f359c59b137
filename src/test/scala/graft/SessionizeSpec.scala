package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Batch sessionization specs: gap semantics, tie-break determinism, and
  * per-user stats. */
class SessionizeSpec extends SparkSpecBase {

  private def events(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("user_id", "event_id", "ts")
  }

  test("a gap strictly greater than the threshold starts a new session") {
    val e = events(
      (1L, 1L, 0L), (1L, 2L, 50L), (1L, 3L, 150L),   // 100 == gap → same session
      (1L, 4L, 251L),                                // 101 > gap → new session
      (2L, 5L, 9999L))
    val out = Sessionize.assign(e, "user_id", "ts", "event_id", gap = 100L)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 0L)
    assert(out(4L) == 1L)
    assert(out(5L) == 0L, "sessions are per-user, not global")
  }

  test("equal timestamps order by the tie column, keeping runs deterministic") {
    val e = events((1L, 2L, 100L), (1L, 1L, 100L), (1L, 3L, 300L))
    val out = Sessionize.assign(e, "user_id", "ts", "event_id", gap = 50L)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Both ts=100 events share session 0 (zero gap between ties); the
    // ts=300 event is 200 past the later tie → session 1.
    assert(out(1L) == 0L && out(2L) == 0L && out(3L) == 1L)
  }

  test("userStats aggregates events, sessions, and the largest session") {
    val e = events(
      (1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 500L), (1L, 4L, 510L), (1L, 5L, 520L),
      (2L, 6L, 0L))
    val out = Sessionize.userStats(e, "user_id", "ts", "event_id", gap = 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_sessions"),
          r.getAs[Long]("max_session_events"))).toMap
    assert(out(1L) == ((5L, 2L, 3L)))
    assert(out(2L) == ((1L, 1L, 1L)))
  }
}
