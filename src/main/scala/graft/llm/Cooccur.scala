package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window token co-occurrence and pointwise mutual information
  * (Church & Hanks 1990, "Word Association Norms, Mutual Information, and
  * Lexicography") — the statistic behind collocation mining, phrase
  * vocabulary induction, and embedding-corpus diagnostics.
  *
  * Scale shape: pair generation is ARRAY-SIDE (zip the token list with its
  * own d-shifted suffix for d = 1..span), so the corpus never self-joins —
  * one shuffle-free explode, then two hash aggregations (pair counts,
  * unigram counts) and a broadcast of the tiny totals. Pair cardinality is
  * corpus tokens × span, linear like tokenization itself. The alternative
  * (positions table self-joined on `pos_b - pos_a BETWEEN 1 AND span`) is
  * what the DuckDB oracle replays — quadratic-ish but exact, fine at
  * oracle scale, and an independent derivation of the same counts.
  *
  * Determinism: counts are exact integers; PMI applies ln to a ratio of
  * count products computed in an op-for-op mirrored order, floored to 4dp
  * on both engines. */
object Cooccur {

  /** Directional co-occurrence pairs (a precedes b within `span` tokens)
    * with PMI. Output: (tok_a, tok_b, n_pair, pmi) for pairs with
    * `n_pair >= minCount`, PMI floored to 4 dp.
    *
    * PMI = ln( (n_pair / N_pairs) / ((n_a / N_tok) · (n_b / N_tok)) ),
    * computed as ln(n_pair · N_tok · N_tok / (N_pairs · n_a · n_b)) in
    * doubles (the mirrored-op form both engines evaluate identically). */
  def pmi(docs: DataFrame, idCol: String, textCol: String,
          span: Int = 2, minCount: Long = 5L): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // d-shifted zips: (t_i, t_{i+d}) for every i; zip_with pads the short
    // side with null, which the null-filter drops — exactly the windows
    // that fit inside the document.
    val pairsArr = flatten(transform(sequence(lit(1), lit(span)), d =>
      zip_with(toks, slice(toks, d + 1, greatest(size(toks) - d, lit(0))),
        (a, b) => struct(a.as("a"), b.as("b")))))
    val pairs = docs.select(explode(pairsArr).as("p"))
      .filter(col("p.b").isNotNull)
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_tok"))
    val totTok = uni.agg(sum("n_tok").as("n_total_tok"))
    val pairCounts = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val totPair = pairs.agg(count(lit(1)).as("n_total_pair"))
    pairCounts
      .join(broadcast(uni.select(col("tok").as("tok_a"), col("n_tok").as("n_a"))), "tok_a")
      .join(broadcast(uni.select(col("tok").as("tok_b"), col("n_tok").as("n_b"))), "tok_b")
      .crossJoin(broadcast(totTok)).crossJoin(broadcast(totPair))
      .select(col("tok_a"), col("tok_b"), col("n_pair"),
        (floor(log(
          col("n_pair").cast("double") * col("n_total_tok").cast("double")
            * col("n_total_tok").cast("double")
            / (col("n_total_pair").cast("double") * col("n_a").cast("double")
               * col("n_b").cast("double"))) * 1e4 + 0.5) / 1e4).as("pmi"))
  }
}
