package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Round-15 pins for the BM25 MRR eval (q_llm_search_mrr) and its
  * one-token-pass kernel [[graft.llm.Index.bm25SearchMulti]]: per-query
  * agreement with the single-query [[graft.llm.Index.bm25Search]] kernel
  * on the real corpus, and a hand-built corpus where every per-query
  * row (ranks, sentinels, micro-units, suite MRR) is derivable by
  * inspection. */
class SearchMrrSpec extends SparkSpecBase {

  test("bm25SearchMulti == bm25Search per query (shared-pass kernel)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val qs = Seq((1L, Seq("data", "query")), (2L, Seq("spark", "join")),
      (3L, Seq("stream", "window")))
    val multi = graft.llm.Index.bm25SearchMulti(docs, "doc_id", "text",
        qs, k = 50)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rows) =>
        qid -> rows.sortBy(_.getLong(4))
          .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      }
    qs.foreach { case (qid, terms) =>
      val single = graft.llm.Index.bm25Search(docs, "doc_id", "text",
          terms, k = 50)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(multi(qid) == single,
        s"query $qid: multi-kernel ranking diverged from single kernel")
    }
  }

  test("hand corpus: first-rank sentinels, micro-units, suite MRR") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mrr").toString
    // q1 (data, query): doc0 holds both -> relevant at rank 1; doc1 is a
    // data-only candidate. q2 (spark, join): spark-only candidates, no
    // relevant. q3 (hash, merge): hash-only. q4/q5: zero candidates.
    Seq((0L, "data query data query"), (1L, "data data"),
        (2L, "spark spark"), (3L, "hash hash"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q_llm_search_mrr")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7))).toMap
    assert(rows(1L) == ((2L, 1L, 1L, 1000000L, 200000L)),
      "doc0 must rank first (only doc with the rare 'query' term)")
    assert(rows(2L) == ((1L, 0L, -1L, 0L, 200000L)))
    assert(rows(3L) == ((1L, 0L, -1L, 0L, 200000L)))
    assert(rows(4L) == ((0L, 0L, -1L, 0L, 200000L)))
    assert(rows(5L) == ((0L, 0L, -1L, 0L, 200000L)))
  }
}
