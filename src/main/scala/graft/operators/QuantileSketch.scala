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

  /** Sketch state. `levels(0)` is a fixed-capacity-`k` scratch array whose
    * first `n0` slots are valid — inserts write in place (the aggregation
    * buffer is owned by its task), so the per-row cost is one store, not
    * an O(k) array copy. Deeper levels (`levels(i)`, weight 2^i) are
    * exact-length arrays touched only by compaction/merge. */
  final case class Buf(levels: Array[Array[Double]], k: Int, n0: Int) {

    def insert(v: Double): Buf = {
      levels(0)(n0) = v
      if (n0 + 1 >= k) compactAll(levelSeqWithScratch(n0 + 1), k)
      else Buf(levels, k, n0 + 1)
    }

    /** Levels as exact-length arrays (scratch sliced to validity). */
    private def levelSeqWithScratch(valid: Int): ArrayBuffer[Array[Double]] = {
      val ls = ArrayBuffer.empty[Array[Double]]
      ls += levels(0).take(valid)
      var i = 1
      while (i < levels.length) { ls += levels(i); i += 1 }
      ls
    }

    def mergeWith(o: Buf): Buf = {
      val a = levelSeqWithScratch(n0)
      val b = o.levelSeqWithScratch(o.n0)
      val n = math.max(a.length, b.length)
      val ls = ArrayBuffer.tabulate(n) { i =>
        val x = if (i < a.length) a(i) else Array.empty[Double]
        val y = if (i < b.length) b(i) else Array.empty[Double]
        x ++ y
      }
      compactAll(ls, k)
    }

    /** Estimated quantile at fraction q ∈ [0,1]: weighted rank over the
      * sorted (value, weight) expansion. */
    def quantile(q: Double): Double = {
      val items = ArrayBuffer.empty[(Double, Long)]
      levels(0).take(n0).foreach(v => items += ((v, 1L)))
      var i = 1
      while (i < levels.length) {
        levels(i).foreach(v => items += ((v, 1L << i)))
        i += 1
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
      n0.toLong + levels.zipWithIndex.drop(1)
        .map { case (vs, i) => vs.length.toLong << i }.sum
  }

  /** Cascade-compact exact-length level arrays, then restore the
    * capacity-`k` scratch invariant on level 0. */
  private def compactAll(ls0: ArrayBuffer[Array[Double]], k: Int): Buf = {
    val ls = ls0
    var i = 0
    while (i < ls.length) {
      if (ls(i).length >= k) {
        val sorted = ls(i).sorted
        // Even indices at doubled weight — deterministic halving.
        val kept = sorted.indices.collect { case j if j % 2 == 0 => sorted(j) }
        if (i + 1 == ls.length) ls += Array.empty[Double]
        ls(i) = Array.empty[Double]
        ls(i + 1) = ls(i + 1) ++ kept
      }
      i += 1
    }
    val scratch = Array.ofDim[Double](k)
    val valid = ls(0).length // < k after compaction
    System.arraycopy(ls(0), 0, scratch, 0, valid)
    ls(0) = scratch
    Buf(ls.toArray, k, valid)
  }

  def emptyBuf(k: Int): Buf = {
    require(k >= 4, s"sketch capacity k must be >= 4, got $k")
    Buf(Array(Array.ofDim[Double](k)), k, 0)
  }

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
