package graft

import graft.operators.Scd2

/** SCD Type-2 semantics: runs open on change only, intervals tile the
  * key's timeline, exactly one current row per key. */
class Scd2Spec extends SparkSpecBase {

  private def rows(changes: Seq[(Long, Long, Long, String)]) = {
    import spark.implicits._
    Scd2.build(changes.toDF("k", "ts", "id", "v"), "k", "ts", "id", "v")
      .orderBy("k", "valid_from", "version_n")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4), r.getBoolean(5)))
  }

  test("consecutive no-op changes collapse; value flips open runs") {
    val out = rows(Seq(
      (1L, 10L, 1L, "gold"), (1L, 20L, 2L, "gold"),   // no-op at 20
      (1L, 30L, 3L, "silver"), (1L, 40L, 4L, "gold")))
    assert(out.toSeq == Seq(
      (1L, "gold", 10L, 30L, 1L, false),
      (1L, "silver", 30L, 40L, 2L, false),
      (1L, "gold", 40L, -1L, 3L, true)))
  }

  test("exactly one open (current) row per key, intervals abut exactly") {
    val changes = for {
      k <- 1L to 5L; i <- 1L to 20L
    } yield (k, i * 7L, k * 100 + i, s"v${i % 3}")
    val out = rows(changes)
    val byKey = out.groupBy(_._1)
    byKey.foreach { case (_, rs) =>
      assert(rs.count(_._6) == 1, "one current row per key")
      rs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) => assert(a._4 == b._3, "valid_to == next valid_from")
        case _ =>
      }
    }
  }

  test("same-timestamp ties order by the change id deterministically") {
    val out = rows(Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")))
    assert(out.toSeq == Seq(
      (1L, "a", 10L, 10L, 1L, false),
      (1L, "b", 10L, -1L, 2L, true)))
  }
}
