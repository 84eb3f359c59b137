package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary (1-bit sign) embedding quantization with Hamming shortlist +
  * exact re-rank — the third rung of the quantization ladder next to
  * int8 ([[Similarity.quantizeInt8]]) and PQ ([[Pq]]), and the cheapest:
  * a 64-dim float vector collapses to ONE packed BIGINT (32× smaller),
  * Hamming distance is a single codegen'd `bit_count(xor)` per candidate,
  * and sign(cos) structure survives well enough that a Hamming top-50
  * shortlist re-ranked by exact cosine recovers the true top-k (the
  * binary-hashing observation behind Charikar 2002 sign-LSH and every
  * "binary quantization" mode in production vector stores).
  *
  * Scale shape: the first pass scans ONLY the 8-byte code column (in a
  * real deployment the codes are a precomputed column — column pruning
  * makes the shortlist scan 32× cheaper than a float scan), TakeOrdered
  * keeps 50 rows, and the exact re-rank reads full vectors for those 50
  * via a broadcast-hash join — full-precision IO proportional to the
  * shortlist, not the corpus, exactly like [[IvfPq]]'s IndexRefine.
  *
  * Determinism: the bit is (x > 0) on the raw stored float — no float
  * arithmetic at all before the re-rank, so an external engine replays
  * the shortlist exactly (it counts sign mismatches; the packed-int form
  * here is the same number by construction). */
object BinaryQuant {

  /** Packed sign code: bit i set iff emb[i] > 0, folded into one BIGINT
    * (dim ≤ 64). The fold is index-ordered but order-independent (OR). */
  def signCode(emb: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= 64, s"signCode packs into one long; dim=$dim")
    aggregate(sequence(lit(0), lit(dim - 1)), lit(0L),
      (acc, i) => acc.bitwiseOR(
        when(element_at(emb, i + lit(1)) > 0f,
          call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))))
  }

  /** Pure-Scala twin of [[signCode]] for the (driver-side, k-element)
    * query vector. */
  def signCodeOf(query: Seq[Double]): Long =
    query.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
      if (x > 0) acc | (1L << i) else acc
    }

  /** Hamming-shortlist + exact-cosine re-rank top-k. `shortlist` trades
    * recall for full-precision reads (FAISS IndexRefine's k-factor). */
  def searchTopK(corpus: DataFrame, embCol: String, idCol: String,
                 query: Seq[Double], k: Int, shortlist: Int): DataFrame = {
    val dim = query.length
    val qCode = signCodeOf(query)
    val short = corpus
      .select(col(idCol), signCode(col(embCol), dim).as("code"))
      .select(col(idCol),
        bit_count(col("code").bitwiseXOR(lit(qCode))).cast("long").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(shortlist)
    corpus.join(broadcast(short), Seq(idCol))
      .select(col(idCol), col("hamming"),
        Similarity.roundHalfUp(
          Similarity.cosineToQuery(col(embCol), query), 6).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }
}
