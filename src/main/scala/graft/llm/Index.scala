package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus indexing operators: inverted index (term → postings) and TF-IDF
  * term scoring — the lookup structures a retrieval/curation layer builds
  * over a training corpus. */
object Index {

  /** Inverted index: one row per distinct term with its document frequency
    * and the first `maxPostings` posting doc ids (ascending, comma-joined).
    *
    * Scale shape: the naive `collect_list(id)` aggregate would materialize
    * the FULL posting list per term before truncation — for a stopword in a
    * trillion-token corpus that is one executor holding millions of ids.
    * Instead the posting sample is capped BEFORE aggregation with a
    * rank-limit window (row_number ≤ maxPostings), which Spark's
    * WindowGroupLimit rewrites into a pre-shuffle per-partition limit —
    * each map task ships at most maxPostings rows per term. The true df
    * comes from a separate codegen'd count aggregate over the uncapped
    * rows; both sides shuffle on the same term key. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 20): DataFrame = {
    val terms = docs.select(col(idCol).as("_id"),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    val df = terms.groupBy("term").agg(count(lit(1)).as("df"))
    val limited = terms
      .withColumn("_rn", row_number().over(Window.partitionBy("term").orderBy("_id")))
      .filter(col("_rn") <= maxPostings)
      .groupBy("term")
      .agg(array_join(sort_array(collect_list(col("_id"))), ",").as("postings"))
    df.join(limited, Seq("term"))
  }

  /** Top-k terms per document by Okapi BM25 (Lucene's non-negative idf
    * variant: ln(1 + (N − df + 0.5)/(df + 0.5))), the retrieval-grade
    * upgrade of [[tfIdfTopTerms]] with tf saturation (k1) and document-
    * length normalization (b). Scores round half-up to 4 decimals for
    * cross-engine hash comparison; ties break on the term.
    *
    * Plan shape matches tfIdfTopTerms — one token explode feeding three
    * partial-aggregated groupBys (tf by doc+term, dl by doc, df by term),
    * the corpus stats (N, avgdl) as a broadcast single-row aggregate, and
    * the per-doc top-k as a rank-limit window that WindowGroupLimit prunes
    * before the shuffle. The df join stays AQE-sized (vocabulary is
    * corpus-dependent). Nothing here holds more than one doc's terms in
    * memory at a time, so the shape survives a 100 TB corpus. */
  def bm25TopTerms(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val terms = docs.select(col(idCol).as("_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val dl = terms.groupBy("_id").agg(count(lit(1)).as("dl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("_nd"), avg(col("dl")).as("_avgdl"))
    val idf = log(lit(1.0) + (col("_nd") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("_avgdl"))
    val scored = tf.join(dl, "_id").join(df, Seq("term")).crossJoin(broadcast(stats))
      .withColumn("bm25",
        Similarity.roundHalfUp(idf * (col("tf") * lit(k1 + 1)) / norm, 4))
    scored
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_id").orderBy(col("bm25").desc, col("term"))))
      .filter(col("_rn") <= k)
      .select(col("_id").as(idCol), col("term"), col("tf"), col("bm25"))
  }

  /** Top-k DOCUMENTS for a multi-term query by summed Okapi BM25 — the
    * retrieval direction of [[bm25TopTerms]]: instead of describing each
    * document by its heaviest terms, rank the corpus against a fixed query
    * (the "find me training examples about X" curation lookup, and the
    * sparse half of a hybrid sparse+dense retrieval stack).
    *
    * Determinism across engines: the per-term contribution is floored to
    * integer 1e-4 units BEFORE the per-document sum, so the document score
    * is an exact integer sum (order-independent — summing raw doubles
    * would make the score depend on Spark's partial-aggregation order) and
    * only leaves integer space at the final /1e4 surface division.
    *
    * Plan shape: document length and corpus stats aggregate over ALL
    * tokens (BM25's length normalization needs them), but the tf relation
    * is filtered to the query's terms right at the explode — the join and
    * scoring pipeline carries |query| rows per matching document, not the
    * vocabulary. The final top-k is a global orderBy+limit, which Spark
    * executes as TakeOrderedAndProject (per-partition heaps, no global
    * sort). */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one query term")
    val terms = docs.select(col(idCol).as("_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val dl = terms.groupBy("_id").agg(count(lit(1)).as("dl"))
    val qtf = terms.filter(col("term").isInCollection(queryTerms))
      .groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("_nd"),
      avg(col("dl")).as("_avgdl"))
    val idf = log(lit(1.0) + (col("_nd") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("_avgdl"))
    qtf.join(dl, "_id").join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_c4",
        floor(idf * (col("tf") * lit(k1 + 1)) / norm * 1e4 + 0.5).cast("long"))
      .groupBy("_id")
      .agg(count(lit(1)).as("n_terms_matched"),
        (sum(col("_c4")) / 1e4).as("score"))
      .orderBy(col("score").desc, col("_id"))
      .limit(k)
      .select(col("_id").as(idCol), col("n_terms_matched"), col("score"))
  }

  /** Multi-query sibling of [[bm25Search]] sharing ONE token pass: the
    * evaluation-harness shape, where scoring Q queries as Q separate
    * kernel calls would scan the corpus Q times. Same per-term integer
    * 1e-4-unit arithmetic (IndexSpec pins per-query agreement with the
    * single-query kernel); the per-query top-k is a qid-partitioned
    * rank-limit window (WindowGroupLimit prunes candidates before the
    * shuffle), and only documents matching ≥ 1 query term ever leave the
    * token explode.
    *
    * @return (qid, idCol, n_terms_matched, score, r) — rank 1..k per qid
    *         by (score desc, id). */
  def bm25SearchMulti(docs: DataFrame, idCol: String, textCol: String,
                      queries: Seq[(Long, Seq[String])], k: Int = 100,
                      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25SearchMulti needs at least one query, each with terms")
    val spark = docs.sparkSession
    import spark.implicits._
    val allTerms = queries.flatMap(_._2).distinct
    val qrel = queries.flatMap { case (qid, ts) =>
      ts.distinct.map(t => (qid, t)) }.toDF("qid", "term")
    val terms = docs.select(col(idCol).as("_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val dl = terms.groupBy("_id").agg(count(lit(1)).as("dl"))
    val qtf = terms.filter(col("term").isInCollection(allTerms))
      .groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val df = qtf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).cast("double").as("_nd"),
      avg(col("dl")).as("_avgdl"))
    val idf = log(lit(1.0) + (col("_nd") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("_avgdl"))
    qtf.join(dl, "_id").join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("_c4",
        floor(idf * (col("tf") * lit(k1 + 1)) / norm * 1e4 + 0.5).cast("long"))
      .join(broadcast(qrel), Seq("term"))
      .groupBy("qid", "_id")
      .agg(count(lit(1)).as("n_terms_matched"),
        (sum(col("_c4")) / 1e4).as("score"))
      .withColumn("r", row_number().over(Window.partitionBy("qid")
        .orderBy(col("score").desc, col("_id"))).cast("long"))
      .filter(col("r") <= k)
      .select(col("qid"), col("_id").as(idCol), col("n_terms_matched"),
        col("score"), col("r"))
  }

  /** Top-k terms per document by TF-IDF (tf · ln(N/df)), the classic
    * relevance weighting. Scores are rounded half-up to 4 decimals so they
    * hash-compare across engines; ties break on the term itself.
    *
    * Plan: one token explode; tf = groupBy(doc, term); df = groupBy(term)
    * over tf (already distinct per doc — no countDistinct needed); N rides
    * in as a broadcast single-row aggregate (a scalar subquery, never a
    * driver-side collect); top-k is a rank-limit window on the doc key
    * (WindowGroupLimit prunes pre-shuffle). The df join keys by term and is
    * left to AQE: vocabulary size is corpus-dependent, so no static
    * broadcast hint. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val terms = docs.select(col(idCol).as("_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("_nd"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        floor(col("tf") * log(col("_nd") / col("df")) * 1e4 + 0.5) / 1e4)
    scored
      .withColumn("_rn", row_number().over(
        Window.partitionBy("_id").orderBy(col("tfidf").desc, col("term"))))
      .filter(col("_rn") <= k)
      .select(col("_id").as(idCol), col("term"), col("tf"), col("tfidf"))
  }
}
