package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Dunning log-likelihood ratio G² for adjacent bigrams (Dunning 1993,
    * "Accurate Methods for the Statistics of Surprise and Coincidence") —
    * the collocation statistic that, unlike PMI, does not explode on rare
    * pairs: each bigram (a,b) is scored by the 2×2 contingency table over
    * the corpus bigram population
    *
    *   k11 = c(a,b)            k12 = c(a,·) − c(a,b)
    *   k21 = c(·,b) − c(a,b)   k22 = N − c(a,·) − c(·,b) + c(a,b)
    *
    * with c(a,·)/c(·,b) the left/right POSITIONAL marginals (so rows and
    * columns both sum to N exactly and every cell is a non-negative
    * integer) and G² = 2·Σ kᵢⱼ·ln(kᵢⱼ·N / (rowᵢ·colⱼ)), 0·ln0 = 0.
    *
    * Scale shape: bigram generation is the same shuffle-free 1-shifted
    * array zip the PMI kernel uses — no corpus self-join; then three hash
    * aggregations (pair counts + two marginals) and broadcast joins of
    * the vocabulary-sized marginals. Every cell is an exact integer; the
    * four ln terms are evaluated in a fixed mirrored order and the sum is
    * floored to 4 dp on both engines. */
  def dunningG2(docs: DataFrame, textCol: String,
                minCount: Long = 5L): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val pairsArr = zip_with(toks,
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => struct(a.as("a"), b.as("b")))
    val pairs = docs.select(explode(pairsArr).as("p"))
      .filter(col("p.b").isNotNull)
      .select(col("p.a").as("tok_a"), col("p.b").as("tok_b"))
    val pc = pairs.groupBy("tok_a", "tok_b")
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val left = pairs.groupBy("tok_a").agg(count(lit(1)).as("n_a"))
    val right = pairs.groupBy("tok_b").agg(count(lit(1)).as("n_b"))
    val tot = pairs.agg(count(lit(1)).as("n_total"))
    // 0·ln0 = 0 convention; N·k / (row·col) evaluated in this exact op
    // order on both engines (products stay far below 2^53 at gate scale).
    def term(o: Column, r: Column, c: Column, n: Column): Column =
      when(o === 0L, lit(0.0)).otherwise(
        o.cast("double") * log(o.cast("double") * n.cast("double")
          / (r.cast("double") * c.cast("double"))))
    val k11 = col("n_pair")
    val k12 = col("n_a") - col("n_pair")
    val k21 = col("n_b") - col("n_pair")
    val k22 = col("n_total") - col("n_a") - col("n_b") + col("n_pair")
    val r2 = col("n_total") - col("n_a")
    val c2 = col("n_total") - col("n_b")
    pc
      .join(broadcast(left), "tok_a")
      .join(broadcast(right), "tok_b")
      .crossJoin(broadcast(tot))
      .select(col("tok_a"), col("tok_b"), col("n_pair"),
        col("n_a"), col("n_b"),
        (floor((term(k11, col("n_a"), col("n_b"), col("n_total"))
          + term(k12, col("n_a"), c2, col("n_total"))
          + term(k21, r2, col("n_b"), col("n_total"))
          + term(k22, r2, c2, col("n_total"))) * 2.0 * 1e4 + 0.5) / 1e4)
          .as("g2"))
  }
}
