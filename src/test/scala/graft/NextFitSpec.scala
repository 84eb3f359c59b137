package graft

import java.nio.file.Files

/** Next-fit fold semantics for the two packing queries. The DuckDB oracle
  * REPLAYS the same fold, so only a unit pin can catch the semantic
  * off-by-one ADVICE r11 flagged: an element arriving at an EMPTY current
  * chunk/bin (the initial state) must fill it in place — even when it
  * overflows the cap — never phantom-count the empty first chunk. */
class NextFitSpec extends SparkSpecBase {

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-nextfit").toString
    rows.toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("chunk-sentences: a first sentence longer than the cap fills " +
      "chunk 1 in place (no phantom empty chunk)") {
    val longSent = Seq.fill(70)("tok").mkString(" ") // 70 tokens > cap 64
    val dir = docsDir(Seq(
      (0L, s"$longSent. one two three."), // stoks [70, 3] -> 2 chunks
      (13L, "a b c d e. f g h i j.")))    // stoks [5, 5]  -> 1 chunk
    val out = SparkEntry.queries("q_llm_chunk_sentences")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(out == Seq(
      (0L, 2L, 73L, 2L, 70L),   // NOT 3 chunks: 70 fills chunk 1
      (13L, 2L, 10L, 1L, 10L)))
  }

  test("compaction plan: a first file larger than the cap fills bin 1 " +
      "in place (no phantom empty bin)") {
    val dir = docsDir(Seq(
      (0L, "x" * 70000),  // shard 0: 70000 chars > cap 65536
      (32L, "y" * 100)))  // shard 1: 100 chars
    val r = SparkEntry.queries("q_store_compaction_plan")(spark, dir)
      .collect().head
    assert(r.getLong(0) == 2L)      // n_files
    assert(r.getLong(1) == 70100L)  // total_chars
    assert(r.getLong(3) == 2L,      // bins_nfd: NOT 3
      s"phantom empty first bin: got ${r.getLong(3)}")
    assert(r.getLong(4) == 2L)      // lower_bound ⌈70100/65536⌉
  }
}
