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
}
