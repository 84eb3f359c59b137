package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Wave-29 pins: keyset pagination (cursor semantics on the composite
  * key, incl. the same-date tie page boundary) and per-group mode
  * (deterministic smallest-modal-value tie-break). */
class KeysetModeSpec extends SparkSpecBase {

  test("keyset: same-date orders split exactly at the cursor key") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-keyset").toString
    val cursorDay = Timestamp.valueOf("1997-03-15 00:00:00")
    val before = Timestamp.valueOf("1997-03-14 00:00:00")
    val after = Timestamp.valueOf("1997-03-16 00:00:00")
    // Cursor is (1997-03-15, 29702): same-date keys 29701/29702 are on
    // page 1 (excluded); 29703 and later dates paginate in key order.
    val rows = Seq(
      (29701L, before, "1-URGENT", 10.0),
      (29701L, cursorDay, "1-URGENT", 11.0),
      (29702L, cursorDay, "2-HIGH", 12.0),
      (29703L, cursorDay, "3-MEDIUM", 13.0),
      (29700L, after, "4-NOT SPECIFIED", 14.0))
    rows.toDF("o_orderkey", "o_orderdate", "o_orderpriority",
        "o_totalprice")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_w_keyset_pagination")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 29703L, "1997-03-15"),
      (2L, 29700L, "1997-03-16")))
  }

  test("mode: ties break to the smallest modal value, share exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mode").toString
    // Flag A: qty 5 ×3, qty 2 ×3 (tie → 2 wins), qty 9 ×2 → n=8,
    // share = 3*1e4 div 8 = 3750. Flag B: qty 7 ×1.
    val rows = Seq.fill(3)(("A", 5.0)) ++ Seq.fill(3)(("A", 2.0)) ++
      Seq.fill(2)(("A", 9.0)) ++ Seq(("B", 7.0))
    rows.zipWithIndex.map { case ((f, q), i) => (i.toLong, f, q) }
      .toDF("l_orderkey", "l_returnflag", "l_quantity")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_agg_mode")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got("A") == (2L, 3L, 3750L))
    assert(got("B") == (7L, 1L, 10000L))
  }
}
