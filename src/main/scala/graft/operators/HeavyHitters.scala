package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequent-items (heavy hitters) summary — the frequency
  * counterpart of [[QuantileSketch]] on this engine's custom-AGGREGATE
  * surface.
  *
  * Structure: Misra–Gries counters with a batched purge. At most `cap`
  * counters are kept; when an unseen item arrives with the table full, the
  * minimum counter value is subtracted from every counter and zeros are
  * dropped. In `insert` that minimum is always exactly 1 (the just-admitted
  * item enters with count 1), so the subtraction IS classic MG subtract-1 —
  * err grows by 1 per purge, never faster. What the batching buys is purely
  * the drop: one O(cap) pass clears the whole unit-count tail of a Zipf
  * distribution, freeing many slots, so the purge amortizes over many
  * subsequent misses instead of firing per miss.
  * Merging follows Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * pointwise-sum the counter tables, then subtract the (cap+1)-th largest
  * value and keep strictly-positive counters.
  *
  * Error contract: every surviving counter UNDERcounts by at most `err`
  * (the accumulated subtractions on that merge path), and any item whose
  * true count exceeds `err` is guaranteed present — both spec-pinned.
  * When the distinct-item count never exceeds `cap`, no purge ever fires,
  * `err` stays 0, and the summary is EXACT regardless of partitioning or
  * merge order (what the DuckDB oracle checks).
  *
  * Why it matters at 100 TB: exact top-k terms needs a full shuffle of the
  * token relation (groupBy token). This summary is O(cap) memory, combines
  * map-side (partial aggregation BEFORE the shuffle), and ships one
  * counter table per partition — the corpus-vocabulary shape (billions of
  * tokens, bounded interesting head) that DataSketches' frequent-items
  * serves in every warehouse. */
object HeavyHitters {

  /** One reported item. */
  final case class Hit(item: String, cnt: Long)

  /** Counter state. `err` bounds the per-counter undercount. The counter
    * table is a MUTABLE HashMap updated in place: `reduce` runs once per
    * corpus token, and the Aggregator contract explicitly allows mutating
    * and returning the buffer — a persistent map here would allocate an
    * update path per token. `copy(err = …)` after a purge shares the
    * (already-purged) table; only the small wrapper is reallocated. */
  final case class Buf(counts: mutable.HashMap[String, Long], cap: Int, err: Long) {

    def insert(item: String): Buf =
      counts.get(item) match {
        case Some(c) => counts.update(item, c + 1); this
        case None if counts.size < cap =>
          counts.update(item, 1L); this
        case None =>
          // Full + unseen: admit, then subtract the min from everyone.
          counts.update(item, 1L)
          val m = counts.valuesIterator.min
          counts.mapValuesInPlace((_, v) => v - m)
          counts.filterInPlace((_, v) => v > 0)
          copy(err = err + m)
      }

    def mergeWith(o: Buf): Buf = {
      o.counts.foreach { case (k, v) =>
        counts.update(k, counts.getOrElse(k, 0L) + v)
      }
      if (counts.size <= cap) copy(err = err + o.err)
      else {
        // Subtract the (cap+1)-th largest value; keep strictly positive.
        val t = counts.valuesIterator.toArray.sortBy(-_).apply(cap)
        counts.mapValuesInPlace((_, v) => v - t)
        counts.filterInPlace((_, v) => v > 0)
        copy(err = err + o.err + t)
      }
    }

    /** Top-k by (count desc, item asc) — a total, engine-portable order. */
    def top(k: Int): Seq[Hit] =
      counts.toSeq.sortBy { case (item, c) => (-c, item) }
        .take(k).map { case (item, c) => Hit(item, c) }
  }

  def emptyBuf(cap: Int): Buf = {
    require(cap >= 1, s"heavy-hitters capacity must be >= 1, got $cap")
    Buf(mutable.HashMap.empty, cap, 0L)
  }

  /** Aggregator reporting the top-`k` items. DataFrame use via
    * `functions.udaf(...)`; typed Dataset use via `.toColumn`. */
  final case class TopKAgg(cap: Int, k: Int)
      extends Aggregator[String, Buf, Seq[Hit]] {
    override def zero: Buf = emptyBuf(cap)
    override def reduce(b: Buf, item: String): Buf =
      if (item == null) b else b.insert(item)
    override def merge(a: Buf, b: Buf): Buf = a.mergeWith(b)
    override def finish(b: Buf): Seq[Hit] = b.top(k)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Hit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hit]]()
  }
}
