package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch as a typed `Aggregator` — the custom
  * AGGREGATE surface of this engine (scalar extensions are Catalyst
  * expressions; this is the partial/merge/finish side).
  *
  * Structure: a deterministic multi-level compactor in the KLL family
  * (Karnin–Lang–Liberty 2016) with the randomness removed — when a level
  * buffer reaches `k` items it sorts and keeps the EVEN-index half at
  * doubled weight. Deterministic compaction trades KLL's unbiasedness
  * guarantee for exact reproducibility (same input multiset + same merge
  * tree → same sketch), which is this engine's contract everywhere; the
  * rank error stays O(levels/k) in practice and is spec-bounded against
  * exact percentiles on real data.
  *
  * Why it matters at 100 TB: exact `percentile` needs the full value
  * multiset per group (a sort-based aggregate buffering everything);
  * this sketch is O(k·log(n/k)) memory per group, combines map-side
  * (partial aggregation BEFORE the shuffle), and merges associatively —
  * the same reason every warehouse ships t-digest/KLL for p99-style
  * monitoring queries. */
object QuantileSketch {

  /** Sketch state: per-level value buffers; level i items carry weight
    * 2^i. Kept as plain nested arrays for tungsten-friendly encoding. */
  final case class Buf(levels: Array[Array[Double]], k: Int) {
    def insert(v: Double): Buf = {
      // Copies the level spine + level 0 only (≤ k values); deeper levels
      // are shared structurally. Compaction is amortized O(1) per insert.
      val ls = levels.updated(0, levels(0) :+ v)
      if (ls(0).length >= k) compact(Buf(ls, k)) else Buf(ls, k)
    }

    private def compact(b: Buf): Buf = {
      var ls = b.levels
      var i = 0
      while (i < ls.length) {
        if (ls(i).length >= b.k) {
          val sorted = ls(i).sorted
          // Even indices at doubled weight — deterministic halving.
          val kept = sorted.indices.collect { case j if j % 2 == 0 => sorted(j) }
          if (i + 1 == ls.length) ls = ls :+ Array.empty[Double]
          ls = ls.updated(i, Array.empty[Double])
            .updated(i + 1, ls(i + 1) ++ kept)
        }
        i += 1
      }
      Buf(ls, b.k)
    }

    def mergeWith(o: Buf): Buf = {
      val n = math.max(levels.length, o.levels.length)
      val ls = Array.tabulate(n) { i =>
        val a = if (i < levels.length) levels(i) else Array.empty[Double]
        val b = if (i < o.levels.length) o.levels(i) else Array.empty[Double]
        a ++ b
      }
      compact(Buf(ls, k))
    }

    /** Estimated quantile at fraction q ∈ [0,1]: weighted rank over the
      * sorted (value, weight) expansion. */
    def quantile(q: Double): Double = {
      val items = ArrayBuffer.empty[(Double, Long)]
      levels.zipWithIndex.foreach { case (vs, i) =>
        vs.foreach(v => items += ((v, 1L << i)))
      }
      if (items.isEmpty) return Double.NaN
      val sorted = items.sortBy(x => (x._1, x._2))
      val total = sorted.map(_._2).sum
      val target = math.max(1L, math.ceil(q * total).toLong)
      var acc = 0L
      var idx = 0
      while (idx < sorted.length - 1 && acc + sorted(idx)._2 < target) {
        acc += sorted(idx)._2
        idx += 1
      }
      sorted(idx)._1
    }

    def totalWeight: Long =
      levels.zipWithIndex.map { case (vs, i) => vs.length.toLong << i }.sum
  }

  def emptyBuf(k: Int): Buf = Buf(Array(Array.empty[Double]), k)

  /** Aggregator producing the quantile estimates for `qs`. Usable as a
    * DataFrame aggregate via `functions.udaf(...)` (see the registry) or
    * on a typed Dataset via `.toColumn`. */
  final case class SketchAgg(k: Int, qs: Seq[Double])
      extends Aggregator[Double, Buf, Seq[Double]] {
    override def zero: Buf = emptyBuf(k)
    override def reduce(b: Buf, v: Double): Buf = b.insert(v)
    override def merge(a: Buf, b: Buf): Buf = a.mergeWith(b)
    override def finish(b: Buf): Seq[Double] = qs.map(b.quantile)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }
}
