package graft

import org.apache.spark.sql.functions._

import graft.store.IncrementalAgg

/** Incremental aggregate maintenance: folding deltas into keys-sized
  * state equals the full re-aggregate, over any number of batches. */
class IncrementalAggSpec extends SparkSpecBase {

  test("state + delta merge == one-shot aggregate, across 4 batches") {
    import spark.implicits._
    def batch(lo: Int, hi: Int) =
      (lo until hi).map(i => (s"k${i % 7}", i * 1.25)).toDF("k", "x")
    val batches = Seq(batch(0, 100), batch(100, 150), batch(150, 151),
      batch(151, 400))
    var state = IncrementalAgg.partial(batches.head, Seq("k"), "x")
    batches.tail.foreach { b =>
      state = IncrementalAgg.merge(state,
        IncrementalAgg.partial(b, Seq("k"), "x"), Seq("k"))
    }
    val full = IncrementalAgg.partial(batch(0, 400), Seq("k"), "x")
    val got = state.orderBy("k").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDecimal(2)))
    val want = full.orderBy("k").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("state stays one row per key after merging") {
    import spark.implicits._
    val b1 = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x")
    val b2 = Seq(("a", 3.0), ("c", 4.0)).toDF("k", "x")
    val merged = IncrementalAgg.merge(
      IncrementalAgg.partial(b1, Seq("k"), "x"),
      IncrementalAgg.partial(b2, Seq("k"), "x"), Seq("k"))
    assert(merged.count() == 3)
    assert(merged.groupBy("k").count().agg(max("count")).head.getLong(0) == 1)
  }
}
