package graft

import java.nio.file.Files

/** Wave-25 pins: Markov removal-effect attribution — hand journeys with
  * closed-form absorption probabilities and removal effects. */
class MarkovAttributionSpec extends SparkSpecBase {

  private def eventsDir(journeys: Seq[(Long, Seq[String])]): String = {
    import spark.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val rows = for {
      (u, path) <- journeys; (ty, i) <- path.zipWithIndex
    } yield (u * 1000 + i, u * dayNs + i * 1000L, u, ty, 1.0)
    val dir = Files.createTempDirectory("graft-mattr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  test("symmetric two-channel universe: equal removal effects") {
    // u1 click→purchase, u2 view→purchase, u3 click (ends), u4 view
    // (ends). p(START→{click,view}) = 1/2 each; p(ch→CONV) = 1/2.
    // v(START) = 1/2; removing either channel halves it → removal
    // effect 1/4 each, equal 5000 bp shares.
    val dir = eventsDir(Seq(
      (1L, Seq("click", "purchase")), (2L, Seq("view", "purchase")),
      (3L, Seq("click")), (4L, Seq("view"))))
    val got = SparkEntry.queries("q_e_markov_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") == (500000L, 250000L, 250000L, 5000L))
    assert(got("view") == (500000L, 250000L, 250000L, 5000L))
  }

  test("serial funnel: removing any hop kills all conversion") {
    // One journey click→view→purchase: every transition is certain, so
    // v(START) = 1; removing either channel zeroes it entirely.
    val dir = eventsDir(Seq((1L, Seq("click", "view", "purchase"))))
    val got = SparkEntry.queries("q_e_markov_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") == (1000000L, 0L, 1000000L, 5000L))
    assert(got("view") == (1000000L, 0L, 1000000L, 5000L))
  }

  test("events after the first purchase never leak into the chain") {
    // u1 converts at step 1 then keeps clicking and viewing; the
    // post-purchase tail is invisible to the CHAIN (click keeps its
    // full credit) but 'view' still exists in the channel universe —
    // correctly reported with zero transitions and zero credit.
    val a = eventsDir(Seq((1L, Seq("click", "purchase", "click", "view"))))
    val got = SparkEntry.queries("q_e_markov_attribution")(spark, a)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("click") == (1000000L, 0L, 1000000L, 10000L),
      "chain credit identical to a pure click->purchase journey")
    assert(got("view") == (1000000L, 1000000L, 0L, 0L),
      "post-purchase-only channel gets zero removal effect")
  }
}
