package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any word
  * n-gram with a benchmark/eval set, the standard pre-training hygiene step
  * (n-gram overlap decontamination as popularized by the GPT-3/PaLM data
  * cards).
  *
  * Scale shape: the benchmark side is tiny relative to the corpus (eval
  * suites are megabytes, training corpora are terabytes), so its distinct
  * n-gram set is BROADCAST; the corpus side is one codegen'd
  * shingle-explode, a broadcast left-semi probe (no shuffle of the corpus),
  * and a single groupBy(doc) count shuffle. Nothing in the plan scales
  * with corpus × benchmark.
  */
object Decontaminate {

  /** Per-document contamination report against `bench`: the count of the
    * document's distinct n-grams that appear anywhere in the benchmark set,
    * and the keep/drop flag. Documents shorter than n tokens degrade to one
    * whole-text gram, exactly like [[Dedup.shingles]]. */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int = 5): DataFrame = {
    val docGrams = docs.select(col(idCol),
      explode(Dedup.shingles(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
    // shingles() is already per-doc distinct, so the semi-join hit count is
    // the distinct-gram overlap with no extra dedup pass.
    val hits = docGrams.join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-filter contamination flag — the variant for when the benchmark
    * gram set outgrows exact broadcast (an exact distinct-gram relation
    * stops broadcasting somewhere in the gigabytes; the Bloom filter over
    * the same grams is ~1.2 MB per million grams at 1% fpp). One-sided
    * error: a truly contaminated document is NEVER missed (asserted by
    * CorpusOpsSpec against [[contamination]]). `fpp` is PER GRAM and
    * compounds over a document's grams — a clean doc with G grams
    * false-positives with probability ≈ 1-(1-fpp)^G — so pick
    * fpp ≈ (target doc-level fpp) / (typical grams per doc), the union
    * bound. The filter only grows with log(1/fpp), so the tighter
    * setting is nearly free.
    *
    * Shape: the filter builds distributed (`stat.bloomFilter` tree-
    * aggregates the benchmark grams), then ships once per executor inside
    * the native [[graft.expressions.BloomAnyContain]] expression — the
    * corpus side is ONE shuffle-free projection with an early-exit loop
    * per row: no gram explode, no join, no groupBy. */
  def bloomContamination(docs: DataFrame, idCol: String, textCol: String,
                         bench: DataFrame, benchTextCol: String,
                         n: Int = 5, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected = math.max(benchGrams.count(), 1L)
    val bloom = benchGrams.stat.bloomFilter("gram", expected, fpp)
    benchGrams.unpersist()
    docs.select(col(idCol), Bridge.column(graft.expressions.BloomAnyContain(
      Bridge.expression(Dedup.shingles(col(textCol), n)), bloom))
      .as("contaminated_bloom"))
  }

  /** [[bloomContamination]] with an md5-derived filter
    * ([[graft.expressions.MdBloom]]): same one-sided-error contract and
    * the same distributed-build shape (per-partition bitsets OR-merged in
    * a treeAggregate, exactly how `stat.bloomFilter` builds), but every
    * bit position is `md5("j:gram")`-derived — so an external SQL engine
    * can rebuild the identical bitset and replay membership INCLUDING the
    * false positives. This is the oracle-checkable variant; the
    * Murmur-based [[bloomContamination]] remains for callers that want
    * `util.sketch.BloomFilter` interop. */
  def mdBloomContamination(docs: DataFrame, idCol: String, textCol: String,
                           bench: DataFrame, benchTextCol: String,
                           n: Int = 5, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    import graft.expressions.MdBloom
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("gram"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGrams = math.max(benchGrams.count(), 1L)
    val m = MdBloom.optimalNumBits(nGrams, fpp)
    val k = MdBloom.optimalNumHashes(nGrams, m)
    val words = ((m + 63) / 64).toInt
    // Positions computed with BUILTIN expressions (codegen'd md5/conv —
    // the identical arithmetic MdBloom.position runs on the probe side),
    // then OR-folded into per-partition bitsets and tree-merged. The
    // aggregate is bounded by m bits regardless of gram count.
    val posCols = (0 until k).map(j =>
      conv(substring(md5(concat(lit(s"$j:"), col("gram"))), 1, 13), 16, 10)
        .cast("long") % m)
    val positions = benchGrams.select(explode(array(posCols: _*)).as("pos"))
    val bits = positions.select(col("pos")).rdd.map(_.getLong(0))
      .treeAggregate(new Array[Long](words))(
        (arr, p) => { arr((p >> 6).toInt) |= 1L << (p & 63).toInt; arr },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    benchGrams.unpersist()
    docs.select(col(idCol), Bridge.column(graft.expressions.MdBloomAnyContain(
      Bridge.expression(Dedup.shingles(col(textCol), n)), bits, m, k))
      .as("contaminated_bloom"))
  }
}
