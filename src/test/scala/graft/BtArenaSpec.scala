package graft

import java.nio.file.Files

/** Round-15 pins for the Bradley–Terry arena ranking (q_e_bt_arena):
  * law-based checks on hand corpora where the MM fixpoint is forced —
  * total dominance must produce a strict ranking with the all-loser at
  * zero, an exactly symmetric battle matrix must leave every score at
  * the 10⁶ init (ties broken lexicographically), and the per-iteration
  * normalization must keep the score mass within truncation of T·10⁶. */
class BtArenaSpec extends SparkSpecBase {

  private val HI = 150.0
  private val LO = 5.0

  /** One battle per user: two events, first wins (HI beats LO). */
  private def duel(baseUser: Long, n: Int, winner: String,
                   loser: String): Seq[(Long, Long, Long, String, Double)] =
    (0 until n).flatMap { k =>
      val u = baseUser + k
      Seq((u * 10 + 1, 1000000000L, u, winner, HI),
        (u * 10 + 2, 2000000000L, u, loser, LO))
    }

  private def run(rows: Seq[(Long, Long, Long, String, Double)])
  : Map[String, (Long, Long, Long, Long)] = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries("q_e_bt_arena")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
  }

  test("total dominance: strict ranking, all-loser scores zero") {
    val out = run(duel(100, 10, "alpha", "beta")
      ++ duel(200, 10, "alpha", "gamma")
      ++ duel(300, 10, "beta", "gamma"))
    val (nbA, wA, btA, rkA) = out("alpha")
    val (nbB, wB, btB, rkB) = out("beta")
    val (nbC, wC, btC, rkC) = out("gamma")
    assert((nbA, nbB, nbC) == ((20L, 20L, 20L)))
    assert((wA, wB, wC) == ((20L, 10L, 0L)))
    assert((rkA, rkB, rkC) == ((1L, 2L, 3L)))
    assert(btA > btB && btB > btC && btC == 0L,
      s"dominance must order scores strictly: $btA, $btB, $btC")
    // Normalization keeps mass within truncation of T * 10^6.
    assert(btA + btB + btC <= 3000000L && btA + btB + btC >= 3000000L - 3)
  }

  test("symmetric battle matrix: every score stays at the 10^6 init") {
    val out = run(duel(100, 10, "alpha", "beta")
      ++ duel(200, 10, "beta", "alpha")
      ++ duel(300, 10, "beta", "gamma")
      ++ duel(400, 10, "gamma", "beta")
      ++ duel(500, 10, "alpha", "gamma")
      ++ duel(600, 10, "gamma", "alpha"))
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    out.foreach { case (ty, (nb, w, bt, _)) =>
      assert(nb == 40L && w == 20L && bt == 1000000L,
        s"$ty: symmetric matrix must fix the score at init, got $bt")
    }
    assert(out("alpha")._4 == 1L && out("beta")._4 == 2L
      && out("gamma")._4 == 3L, "ties must break lexicographically")
  }

  test("real corpus: bounded universe, positive mass, deterministic") {
    val a = SparkEntry.queries("q_e_bt_arena")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q_e_bt_arena")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(a == b, "bt arena must be deterministic run to run")
    assert(a.nonEmpty && a.size <= 12)
  }
}
