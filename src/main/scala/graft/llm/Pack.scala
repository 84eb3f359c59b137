package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence assembly operators for LLM training: global token-offset
  * packing (concat-then-chop into fixed-length sequences) and
  * content-defined chunking. */
object Pack {

  /** Streaming-concatenation packing: documents are laid out in id order as
    * one token stream and chopped into `seqLen`-token training sequences.
    * Emits each document's token count, global start offset, owning
    * sequence id (the sequence holding its first token), and whether it
    * spans a sequence boundary.
    *
    * Scale shape: a global running sum is the textbook window scale-trap —
    * `Window.orderBy(id)` alone collapses the relation onto ONE partition.
    * This is the standard two-pass prefix sum instead: ids bucket by range
    * (`id div bucketSize`), per-bucket totals aggregate small, the
    * bucket-level exclusive prefix runs over that tiny relation (the only
    * single-partition window, #buckets rows), and the broadcast-joined
    * per-bucket base plus an in-bucket exclusive window sum yields exact
    * global offsets with the corpus partitioned by bucket throughout. */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, bucketSize: Int = 4096): DataFrame = {
    val tk = docs.select(col(idCol).as("_id"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("tok_count"))
      .withColumn("_bucket", floor(col("_id") / bucketSize).cast("long"))
    val bucketTotals = tk.groupBy("_bucket").agg(sum("tok_count").as("_btok"))
    val exclusiveBuckets = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketTotals
      .withColumn("_boff", coalesce(sum("_btok").over(exclusiveBuckets), lit(0L)))
      .select("_bucket", "_boff")
    val exclusiveInBucket = Window.partitionBy("_bucket").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    tk.join(broadcast(offsets), Seq("_bucket"))
      .withColumn("start_offset",
        col("_boff") + coalesce(sum("tok_count").over(exclusiveInBucket), lit(0L)))
      .withColumn("seq_id", expr(s"start_offset div $seqLen"))
      .withColumn("crosses_boundary",
        expr(s"(start_offset + tok_count - 1) div $seqLen") > col("seq_id"))
      .select(col("_id").as(idCol), col("tok_count"), col("start_offset"),
        col("seq_id"), col("crosses_boundary"))
  }

  /** Fixed-size token chunking with overlap — the standard RAG/embedding
    * chunker (windows of `chunkSize` tokens every `chunkSize - overlap`
    * tokens). Start positions are `0, stride, 2·stride, …` up to
    * `n - overlap - 1`, which (a) covers every token (the last window
    * always reaches the end because `chunkSize = stride + overlap`) and
    * (b) never emits a tail window whose tokens were all seen by its
    * predecessor. Documents shorter than one window yield exactly one
    * (possibly short) chunk.
    *
    * Plan: one shuffle-free projection — `sequence` builds the start list,
    * `posexplode` fans out, `slice`+`array_join`+`md5` fingerprint each
    * window. All built-ins, all codegen'd; chunk count per row is
    * ~n/stride so the explode is linear in corpus tokens. */
  def fixedChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkSize > overlap,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val window = slice(col("_t"), col("_start") + 1, lit(chunkSize))
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_t"))
      .withColumn("_starts",
        sequence(lit(0), greatest(size(col("_t")) - overlap - 1, lit(0)), lit(stride)))
      .select(col(idCol), col("_t"),
        posexplode(col("_starts")).as(Seq("chunk_idx", "_start")))
      // int64 outputs: the engine-wide convention (oracle parity — DuckDB
      // list positions/lengths are BIGINT, and the driver hash sees types).
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("_start").cast("long").as("start_tok"),
        size(window).cast("long").as("n_tokens"),
        md5(array_join(window, " ")).as("chunk_hash"))
  }

  /** Content-defined chunking at token granularity: a token whose xxhash64
    * lands on `0 mod divisor` closes the current chunk (expected chunk
    * length = divisor tokens). Boundaries depend only on content, so an
    * insertion early in a document shifts at most the chunk containing it —
    * every later chunk re-aligns, which is the property that makes CDC
    * fingerprints stable for dedup of near-identical long documents (same
    * idea as Gear/FastCDC chunking, here on tokens instead of bytes).
    *
    * Plan: posexplode → codegen'd hash flag → per-doc exclusive window sum
    * assigns chunk ids → two hash aggregates (chunk sizes, then per-doc
    * stats). No interpreted lambdas anywhere. */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                divisor: Int = 16, portableBoundary: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("_pos", "_tok")))
    // Boundary test at rate 1/divisor. Portable mode uses the md5
    // hex-threshold trick (Sampling.splitLabel's): `md5(tok) < threshold`
    // is the same predicate in any engine with md5, so the chunking is
    // oracle-checkable; the default stays on codegen'd xxhash64.
    val closes =
      if (portableBoundary)
        md5(col("_tok")) < lit(Sampling.hexThreshold(1.0 / divisor))
      else pmod(xxhash64(col("_tok")), lit(divisor)) === 0
    val flagged = toks.withColumn("_closes", when(closes, 1L).otherwise(0L))
    val priorBoundaries = Window.partitionBy("_id").orderBy("_pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunks = flagged
      .withColumn("chunk_id", coalesce(sum("_closes").over(priorBoundaries), lit(0L)))
      .groupBy(col("_id"), col("chunk_id"))
      .agg(count(lit(1)).as("chunk_tokens"))
    chunks.groupBy(col("_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("chunk_tokens")).as("max_chunk_tokens"),
        min(col("chunk_tokens")).as("min_chunk_tokens"),
        sum(col("chunk_tokens")).as("total_tokens"))
      .withColumnRenamed("_id", idCol)
  }
}
