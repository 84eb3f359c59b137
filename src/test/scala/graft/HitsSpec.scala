package graft

import graft.operators.Hits

/** HITS: hand-walked half-steps (every renormalized unit recomputed by
  * hand, truncation included), plus gate-path and symmetry checks. */
class HitsSpec extends SparkSpecBase {

  private def run(edges: Seq[(Long, Long)], rounds: Int,
                  gate: Long = Hits.BroadcastMaxNodes) = {
    import spark.implicits._
    Hits.topHubsAuthorities(edges.toDF("c", "p"), "c", "p", rounds,
        k = 10, broadcastMaxNodes = gate)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
  }

  // Customer 1 buys parts 10,11,12; customer 2 buys part 10.
  private val g = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))

  test("one round, hand-walked: co-bought part leads, broad basket leads") {
    // a-step: raw a10 = 2e6, a11 = a12 = 1e6 → normalized 1e6 / 5e5 / 5e5.
    // h-step: raw h1 = 2e6, h2 = 1e6 → normalized 1e6 / 5e5.
    val out = run(g, rounds = 1)
    assert(out.filter(_._1 == "auth") == Seq(("auth", 10L, 1000000L),
      ("auth", 11L, 500000L), ("auth", 12L, 500000L)))
    assert(out.filter(_._1 == "hub") == Seq(("hub", 1L, 1000000L),
      ("hub", 2L, 500000L)))
  }

  test("two rounds, hand-walked: truncating renormalization to the unit") {
    // Round 2 a-step: raw a10 = 1.5e6, a11 = a12 = 1e6 →
    //   a10 = 1e6, a11 = a12 = trunc(1e12 / 1.5e6) = 666666.
    // Round 2 h-step: raw h1 = 2333332, h2 = 1000000 →
    //   h1 = 1e6, h2 = trunc(1e12 / 2333332) = 428571.
    val out = run(g, rounds = 2)
    assert(out.filter(_._1 == "auth") == Seq(("auth", 10L, 1000000L),
      ("auth", 11L, 666666L), ("auth", 12L, 666666L)))
    assert(out.filter(_._1 == "hub") == Seq(("hub", 1L, 1000000L),
      ("hub", 2L, 428571L)))
  }

  test("shuffle-join fallback (gate off) matches the broadcast path") {
    assert(run(g, rounds = 2, gate = 0L) == run(g, rounds = 2))
  }

  test("symmetric bipartite clique: everything converges to the unit") {
    val kb = for { c <- 1L to 3L; p <- 10L to 12L } yield (c, p)
    val out = run(kb, rounds = 2)
    assert(out.forall(_._3 == 1000000L), s"uniform scores: $out")
  }

  test("rounds = 0 is rejected up front (no null-score NPE)") {
    assertThrows[IllegalArgumentException](run(g, rounds = 0))
  }

  test("oracle CTEs unroll both half-steps per round") {
    val sql = Hits.oracleCtes("SELECT 1 AS c, 2 AS p", rounds = 2)
    assert(sql.contains("ar1 AS MATERIALIZED"))
    assert(sql.contains("h2 AS MATERIALIZED"))
    assert(!sql.contains("ar3 "))
  }
}
