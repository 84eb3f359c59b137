package graft

import java.nio.file.Files

/** Wave-27 pins: MATCH_RECOGNIZE-style journey regexes on hand journeys
  * with known non-overlapping match counts. */
class PatternMatchSpec extends SparkSpecBase {

  test("hand journeys: adjacency, reach-through, and burst counts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pat").toString
    // u1: view,purchase,view,click,error,purchase → "vpvcep":
    //   'vp' = 1 (non-overlapping leftmost), 'v[ce]*p' = 2, 'ee+' = 0.
    // u2: signup,error,error → "see": 'ee+' = 1.
    // u3: click,view → "cv": nothing.
    val js = Seq(
      (1L, Seq("view", "purchase", "view", "click", "error", "purchase")),
      (2L, Seq("signup", "error", "error")),
      (3L, Seq("click", "view")))
    val rows = for { (u, p) <- js; (ty, i) <- p.zipWithIndex }
      yield (u * 100 + i, u * 1000000L + i, u, ty, 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_e_pattern_match")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got("adjacent_view_purchase") == (1L, 1L))
    assert(got("view_reaches_purchase") == (1L, 2L))
    assert(got("error_burst") == (1L, 1L))
  }
}
