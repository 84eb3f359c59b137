package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.llm.Bpe

class BpeSpec extends SparkSpecBase with TableDrivenPropertyChecks {

  // The Hugging-Face course worked example: pair counts are hand-derived,
  // so the first three merges are fully pinned.
  private val corpus = IndexedSeq(
    ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  test("merge learning picks max-count pairs with deterministic ties") {
    val m = Bpe.trainFromWordFreq(corpus, numMerges = 3)
    // ug=20, un=16, then h+ug=15 beat pu (12 after pug lost its pu pair)
    assert(m.pairs == IndexedSeq(("u", "g"), ("u", "n"), ("h", "ug")))
  }

  test("encode applies merges lowest-rank-first, all occurrences") {
    val enc = Bpe.encoder(Bpe.trainFromWordFreq(corpus, numMerges = 3))
    assert(enc.encodeWord("hugs").toSeq == Seq("hug", "s"))
    assert(enc.encodeWord("pun").toSeq == Seq("p", "un"))
    assert(enc.encodeWord("zzz").toSeq == Seq("z", "z", "z")) // untrained chars
    assert(enc.encodeDoc("hug pun").toSeq == Seq("hug", "p", "un"))
  }

  test("zero merges tokenizes to characters; empty input to empty array") {
    val enc = Bpe.encoder(Bpe.Merges(IndexedSeq.empty))
    assert(enc.encodeWord("abc").toSeq == Seq("a", "b", "c"))
    assert(enc.encodeDoc("").isEmpty)
    assert(enc.encodeDoc("  ").isEmpty)
  }

  test("tokenization is lossless: concatenating a word's tokens restores it") {
    val enc = Bpe.encoder(Bpe.trainFromWordFreq(corpus, numMerges = 5))
    val words = Table("w", "hug", "pug", "pun", "bun", "hugs", "hugger",
      "a", "unhug", "xyzzy")
    forAll(words) { w => assert(enc.encodeWord(w).mkString == w) }
  }

  test("supplementary characters stay whole code points (no surrogate split)") {
    val emoji = "😀" // U+1F600, outside the BMP
    val word = s"hi${emoji}yo"
    val enc = Bpe.encoder(Bpe.Merges(IndexedSeq.empty))
    val toks = enc.encodeWord(word)
    assert(toks.toSeq == Seq("h", "i", emoji, "y", "o"))
    assert(toks.mkString == word) // lossless through the pair
    // training splits identically, so emoji-adjacent merges are learnable
    val m = Bpe.trainFromWordFreq(IndexedSeq((s"$emoji$emoji", 5L)), 1)
    assert(m.pairs == IndexedSeq((emoji, emoji)))
  }

  test("distributed train matches driver-side learning on the same counts") {
    import spark.implicits._
    // 10x hug etc., one word per row, shuffled across partitions.
    val rows = corpus.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    val docs = rows.toDF("text").repartition(7)
    val distributed = Bpe.train(docs, "text", numMerges = 3)
    assert(distributed.pairs == Bpe.trainFromWordFreq(corpus, 3).pairs)
  }

  test("more merges never increase token count; training is deterministic") {
    import spark.implicits._
    val docs = Seq("the cat sat on the mat", "the cats sat", "concatenate")
      .toDF("text")
    def total(n: Int): Long = {
      val m = Bpe.train(docs, "text", numMerges = n)
      docs.select(explode(Bpe.encode(col("text"), m))).count()
    }
    val counts = Seq(0, 2, 4, 8, 16).map(total)
    assert(counts == counts.sorted.reverse, s"not monotone: $counts")
    assert(Bpe.train(docs, "text", 8).pairs == Bpe.train(docs, "text", 8).pairs)
  }

  test("column encode matches the kernel directly (incl. null text)") {
    import spark.implicits._
    val m = Bpe.trainFromWordFreq(corpus, 3)
    val enc = Bpe.encoder(m)
    val df = Seq(Some("hug pun zz"), None).toDF("text")
    val out = df.select(Bpe.encode(col("text"), m).as("t")).collect()
    assert(out(0).getSeq[String](0) == enc.encodeDoc("hug pun zz").toSeq)
    assert(out(1).isNullAt(0))
  }

  test("merge table round-trips through parquet with rank order intact") {
    val m = Bpe.trainFromWordFreq(corpus, numMerges = 5)
    val path = java.nio.file.Files.createTempDirectory("graft-bpe").toString + "/merges"
    Bpe.saveMerges(spark, m, path)
    val back = Bpe.loadMerges(spark, path)
    assert(back.pairs == m.pairs) // order IS the tokenizer
    val enc = Bpe.encoder(back)
    assert(enc.encodeWord("hugs").toSeq ==
      Bpe.encoder(m).encodeWord("hugs").toSeq)
  }

  test("maxWords truncation drops tail words from the statistics") {
    // With maxWords=1 only "pun" (freq 12) survives -> first merge is p+u
    // ... tie-break: pairs pu and un both count 12; lexicographic -> (p,u).
    import spark.implicits._
    val rows = corpus.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
    val m = Bpe.train(rows.toDF("text"), "text", numMerges = 1, maxWords = 1)
    assert(m.pairs == IndexedSeq(("p", "u")))
  }
}
