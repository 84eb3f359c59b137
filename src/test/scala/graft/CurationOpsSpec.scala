package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, NgramLm, TextAnalysis}

/** Round-6 corpus-curation additions: span-level dedup, vocabulary top-k,
  * bigram-LM quality scoring. */
class CurationOpsSpec extends SparkSpecBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  test("span dedup keeps first occurrence, reassembles, drops all-dup docs") {
    // span size 3: doc 1 = [a b c][d e f]; doc 2 repeats [a b c] then has
    // its own tail; doc 3 is doc 1 verbatim (every span a dup -> vanishes)
    val d = docs(
      (1L, "a b c d e f"),
      (2L, "a b c x y z"),
      (3L, "a b c d e f"))
    val out = Dedup.dedupSpans(d, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[String]("dedup_text") == "a b c d e f")
    assert(out(0).getAs[Long]("n_spans_kept") == 2L)
    assert(out(1).getAs[String]("dedup_text") == "x y z") // shared span removed
    assert(out(1).getAs[Long]("n_spans_kept") == 1L)
  }

  test("span dedup: a trailing partial span is its own unit") {
    val d = docs((1L, "a b c d"), (2L, "d")) // doc 1 tail span = [d]
    val out = Dedup.dedupSpans(d, "doc_id", "text", spanTokens = 3)
      .orderBy("doc_id").collect()
    // doc 1 keeps both spans; doc 2's single span "d" already appeared
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getAs[String]("dedup_text") == "a b c d")
  }

  test("line dedup strips repeated boilerplate lines, keeps first occurrence") {
    val d = docs(
      (1L, "unique one\nCOOKIE BANNER\nbody of page one"),
      (2L, "COOKIE BANNER\nunique two"),
      (3L, "COOKIE BANNER")) // nothing survives -> doc vanishes
    val out = Dedup.dedupLines(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[String]("dedup_text") ==
      "unique one\nCOOKIE BANNER\nbody of page one")
    assert(out(0).getAs[Long]("n_lines_kept") == 3L)
    assert(out(1).getAs[String]("dedup_text") == "unique two")
  }

  test("line dedup drops blank lines and dedups within a single document") {
    val d = docs((1L, "same line\n\n  \nsame line\nother"))
    val out = Dedup.dedupLines(d, "doc_id", "text").collect()
    assert(out(0).getAs[String]("dedup_text") == "same line\nother")
    assert(out(0).getAs[Long]("n_lines_kept") == 2L)
  }

  test("duplicated regions: cross-doc run merges, same-doc repeat splits") {
    val d = docs(
      (1L, "a b c d e f g"),        // shares "a b c d e" with doc 2
      (2L, "x x a b c d e y"),
      (3L, "p q r p q r"))          // "p q r" twice WITHIN one doc
    val out = Dedup.duplicatedSpanRegions(d, "doc_id", "text", seedTokens = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    // doc 1: dup seeds at pos 0,1,2 -> ONE maximal region of 5 tokens
    // doc 2: dup seeds at pos 2,3,4 -> ONE region of 5 tokens
    // doc 3: "p q r" at pos 0 and 3 -> TWO regions of 3 tokens, 6 total
    assert(out == Seq((1L, 1L, 5L, 5), (2L, 1L, 5L, 5), (3L, 2L, 6L, 3)))
  }

  test("duplicated regions: unique corpus reports nothing") {
    val d = docs((1L, "one two three four five"), (2L, "six seven eight nine ten"))
    assert(Dedup.duplicatedSpanRegions(d, "doc_id", "text", 3).count() == 0)
  }

  test("incremental dedup: batch-first and new-vs-history flags") {
    import spark.implicits._
    val batch = docs(
      (10L, "alpha beta"), (11L, "alpha beta"), // in-batch dup
      (12L, "seen before"),                     // historical dup
      (13L, "brand new"))
    val seen = Seq("seen before", "other old").toDF("t")
      .select(md5(col("t")).as("h"))
    val out = Dedup.incrementalExact(batch, "doc_id", "text", seen, "h")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Boolean]("is_batch_representative"),
        r.getAs[Boolean]("is_new")))
    assert(out.toSeq == Seq(
      (10L, true, true), (11L, false, true),
      (12L, true, false), (13L, true, true)))
    // the ingest set = representative AND new
    assert(out.filter(r => r._2 && r._3).map(_._1).toSeq == Seq(10L, 13L))
  }

  test("vocabulary top-k counts multiplicity with deterministic ties") {
    val d = docs((1L, "b a b c"), (2L, "a b"))
    val out = TextAnalysis.topVocabulary(d, "text", n = 1, k = 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 3L), ("a", 2L))) // ties broken gram-ascending
  }

  test("bigram LM scores a seen document higher than an unseen-word one") {
    val train = docs((1L, "the cat sat"), (2L, "the cat ran"))
    val model = NgramLm.fit(train, "text")
    assert(model.vocabSize == 4) // the cat sat ran
    val scored = NgramLm.scoreAvgLogProb(
        docs((1L, "the cat sat"), (2L, "zz qq vv")), "doc_id", "text", model)
      .orderBy("doc_id").collect()
    val seen = scored(0).getAs[Double]("avg_logp")
    val unseen = scored(1).getAs[Double]("avg_logp")
    assert(seen > unseen)
    // hand check doc 1: bigrams "the cat" (c2=2), "cat sat" (c2=1);
    // contexts "the" c1=2, "cat" c1=2; V=4 ->
    // avg(ln(3/6), ln(2/6)) rounded per-term to 8dp then to 6dp
    def r8(x: Double) = math.floor(x * 1e8 + 0.5) / 1e8
    val expected = math.floor(
      (r8(math.log(3.0 / 6)) + r8(math.log(2.0 / 6))) / 2 * 1e6 + 0.5) / 1e6
    assert(seen == expected, s"got $seen expected $expected")
  }

  test("bigram LM score is invariant to repartitioning (decimal sum)") {
    val train = docs((1L, "w x y z w x"), (2L, "x y w z"))
    val model = NgramLm.fit(train, "text")
    val base = NgramLm.scoreAvgLogProb(train, "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.getAs[Double]("avg_logp")).toSeq
    val repart = NgramLm.scoreAvgLogProb(
        train.repartition(7), "doc_id", "text", model)
      .orderBy("doc_id").collect().map(_.getAs[Double]("avg_logp")).toSeq
    assert(base == repart)
  }

  test("quality-aware cluster dedup keeps the argmax-score member") {
    import spark.implicits._
    // Cluster {1,2,3} via edges; doc 2 has the best score. Doc 9 is a
    // singleton (no edges) and must be its own representative.
    val docs = Seq((1L, 0.3), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "score")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.dedupByClusterBest(docs, "doc_id", "score", edges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Boolean]("is_representative")))).toMap
    val comp = out(1L)._1
    assert(out(2L) == ((comp, true)), "argmax score wins (tie -> min id)")
    assert(out(3L) == ((comp, false)), "score tie must break to smaller id")
    assert(!out(1L)._2)
    assert(out(9L) == ((9L, true)), "singleton is its own representative")
  }
}
