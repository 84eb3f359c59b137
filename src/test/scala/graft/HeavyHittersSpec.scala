package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Heavy-hitters (Misra–Gries) contracts: exactness below capacity, the
  * undercount/survival error bounds under purge, merge-order robustness of
  * the guarantees, and the distributed path through functions.udaf. */
class HeavyHittersSpec extends SparkSpecBase {

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }

  test("exact when distinct count never exceeds capacity") {
    val xs = Seq.tabulate(1000)(i => s"k${i % 7}")
    val b = xs.foldLeft(HeavyHitters.emptyBuf(16))(_.insert(_))
    assert(b.err == 0L)
    assert(b.counts == trueCounts(xs))
  }

  test("purge: survivors undercount by at most err; no big item is lost") {
    // Zipf-ish: two dominant keys + a long distinct tail, cap far below
    // the distinct count so purges fire constantly.
    val xs = Seq.fill(400)("alpha") ++ Seq.fill(150)("beta") ++
      Seq.tabulate(300)(i => s"tail$i")
    // Deterministic interleave so heavies arrive among the tail.
    val stream = xs.zipWithIndex.sortBy { case (s, i) => (i * 31 % 97, s) }.map(_._1)
    val b = stream.foldLeft(HeavyHitters.emptyBuf(8))(_.insert(_))
    val truth = trueCounts(xs)
    b.counts.foreach { case (k, est) =>
      assert(est <= truth(k), s"$k overcounted")
      assert(truth(k) - est <= b.err, s"$k undercounts beyond err=${b.err}")
    }
    truth.foreach { case (k, c) =>
      if (c > b.err) assert(b.counts.contains(k), s"heavy $k (count $c) lost")
    }
    assert(b.counts.contains("alpha") && b.counts.contains("beta"))
  }

  test("merge keeps the bounds and is deterministic for a given split") {
    val xs = Seq.fill(300)("hot") ++ Seq.tabulate(200)(i => s"t$i")
    val (l, r) = xs.splitAt(137)
    // mergeWith mutates its receiver (the Aggregator owns its buffer), so
    // build fresh buffers per merge.
    def build() = (
      l.foldLeft(HeavyHitters.emptyBuf(8))(_.insert(_)),
      r.foldLeft(HeavyHitters.emptyBuf(8))(_.insert(_)))
    val (bl, br) = build()
    val m = bl.mergeWith(br)
    assert(m.counts.size <= 8)
    val truth = trueCounts(xs)
    m.counts.foreach { case (k, est) =>
      assert(est <= truth(k) && truth(k) - est <= m.err)
    }
    assert(m.counts.contains("hot"))
    // Same inputs, same merge tree -> identical summary (engine contract).
    val (bl2, br2) = build()
    assert(m == bl2.mergeWith(br2))
  }

  test("distributed udaf equals exact top-k when capacity covers distinct") {
    import spark.implicits._
    val tokens = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(30)("c") ++
      Seq.tabulate(40)(i => s"w${i % 10}")).toDF("tok").repartition(7)
    val hh = udaf(HeavyHitters.TopKAgg(cap = 64, k = 5))
    val got = tokens.agg(hh($"tok").as("hh"))
      .select(explode($"hh").as("h"))
      .select($"h.item", $"h.cnt")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val expected = tokens.groupBy("tok").count()
      .orderBy($"count".desc, $"tok".asc).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
