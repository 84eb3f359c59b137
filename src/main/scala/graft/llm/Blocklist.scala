package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

import graft.expressions.MultiPatternMatches

/** Phrase-blocklist screening — the curation step that tags or drops
  * documents containing any of a (potentially large) set of banned
  * phrases. One Aho–Corasick sweep per document
  * ([[graft.expressions.MultiPatternMatches]]) replaces the
  * O(|text|·|patterns|) per-pattern `contains` scan; the pattern set
  * rides to executors once, like a broadcast.
  *
  * Reference analogue: the ingestor's row-level validation predicates
  * (`app/services/ingestor.py`) screen rows against fixed literal rules;
  * this is the corpus-scale generalization a training-data pipeline
  * needs. */
object Blocklist {

  /** Distinct matched patterns per row, in pattern-declaration order. */
  def matches(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiPatternMatches(Bridge.expression(text), patterns))

  /** Per-pattern document counts INCLUDING zero-hit patterns, plus each
    * pattern's share of the corpus — the report that sizes a blocklist
    * before committing to the drop. One automaton pass per doc, then the
    * (tiny) matched arrays explode and aggregate; the patterns relation
    * is driver-literal, so the final join broadcasts. */
  def report(docs: DataFrame, textCol: String, patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nDocs = docs.count()
    val hits = docs
      .select(explode(matches(col(textCol), patterns)).as("pattern"))
      .groupBy("pattern")
      .agg(count(lit(1)).as("n_docs_matched"))
    patterns.toDF("pattern")
      .join(hits, Seq("pattern"), "left")
      .select(col("pattern"),
        coalesce(col("n_docs_matched"), lit(0L)).as("n_docs_matched"),
        (floor(coalesce(col("n_docs_matched"), lit(0L)) / nDocs.toDouble
          * 10000 + lit(0.5)) / 10000).as("doc_frac"))
      .orderBy("pattern")
  }
}
