package graft

import java.nio.file.Files

/** Round-14 wave-11 pins: exact Shapley-value attribution — hand
  * coalition lattices, the unanimity-game decomposition theorem, the
  * null-player axiom, and the no-converter sentinel. */
class ShapleyAttributionSpec extends SparkSpecBase {

  private def eventsDir(journeys: Seq[(Long, Seq[String])]): String = {
    import spark.implicits._
    val dayNs = 86400L * 1000 * 1000 * 1000
    val rows = for {
      (u, path) <- journeys; (ty, i) <- path.zipWithIndex
    } yield (u * 1000 + i, u * dayNs + i * 1000L, u, ty, 1.0)
    val dir = Files.createTempDirectory("graft-shap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    dir
  }

  private def run(dir: String): Map[String, (Long, Long)] =
    SparkEntry.queries("q_e_shapley_attribution")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("hand lattice: {click,view} + {click} converters") {
    // u1's T = {click,view} splits 24 evenly (12 each); u2's T =
    // {click} gives click the full 24. u3 never converts, u4 converts
    // with no pre-purchase touch — both invisible to the game.
    val dir = eventsDir(Seq(
      (1L, Seq("click", "view", "purchase")),
      (2L, Seq("click", "purchase")),
      (3L, Seq("view")),
      (4L, Seq("purchase"))))
    val got = run(dir)
    assert(got("click") == (36L, 7500L))
    assert(got("view") == (12L, 2500L))
    assert(!got.contains("purchase"))
  }

  test("unanimity decomposition: coalition enumeration == even split over T") {
    // The characteristic function v(S) = #{users: T ⊆ S} is a sum of
    // unanimity games, so the enumerated Shapley value must equal
    // Σ_u 24/|T_u| over converters containing the channel — an
    // independent closed form the 32-marginal fold has to reproduce.
    val journeys: Seq[(Long, Seq[String])] = Seq(
      (1L, Seq("click", "error", "signup", "view", "purchase")),
      (2L, Seq("view", "click", "view", "purchase")),
      (3L, Seq("signup", "purchase")),
      (4L, Seq("error", "view", "signup", "purchase")),
      (5L, Seq("click", "click", "purchase")),
      (6L, Seq("view", "purchase")),
      (7L, Seq("error", "click")), // non-converter
      (8L, Seq("signup", "error", "purchase", "click", "view")))
    val sets = journeys.collect {
      case (_, path) if path.contains("purchase") =>
        path.takeWhile(_ != "purchase").distinct
    }.filter(_.nonEmpty)
    val expected = Seq("click", "error", "signup", "view").map { c =>
      c -> sets.filter(_.contains(c)).map(t => 24L / t.size).sum
    }.toMap
    val got = run(eventsDir(journeys))
    expected.foreach { case (c, p) =>
      assert(got(c)._1 == p, s"phi24($c): got ${got(c)._1}, want $p")
    }
    assert(got.values.map(_._1).sum == sets.map(_ => 24L).sum,
      "efficiency axiom: Σφ24 = 24·v(full universe)")
  }

  test("null player: post-purchase-only channel reports zero credit") {
    val dir = eventsDir(Seq((1L, Seq("click", "purchase", "view"))))
    val got = run(dir)
    assert(got("click") == (24L, 10000L))
    assert(got("view") == (0L, 0L), "view never pre-purchase: null player")
  }

  test("no converters: channels emitted with zero phi and zero share") {
    val dir = eventsDir(Seq((1L, Seq("click", "view")), (2L, Seq("error"))))
    val got = run(dir)
    assert(got == Map("click" -> ((0L, 0L)), "error" -> ((0L, 0L)),
      "view" -> ((0L, 0L))))
  }
}
