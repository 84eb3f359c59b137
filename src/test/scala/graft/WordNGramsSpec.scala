package graft

import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** The native WordNGrams kernel must be bit-identical — values AND order —
  * to the Column-API higher-order-function formulation it replaced. */
class WordNGramsSpec extends SparkSpecBase {

  private def both(text: String, n: Int): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    val native = df.select(Dedup.shingles(col("text"), n)).head.getSeq[String](0)
    val columnApi = df.select(Dedup.shinglesColumnApi(col("text"), n)).head.getSeq[String](0)
    (native, columnApi)
  }

  test("native shingles match the Column-API formulation exactly") {
    val cases = Seq(
      ("the quick brown fox jumps over the lazy dog", 3),
      ("a b a b a b a b", 2),                        // heavy duplication
      ("single", 3),                                 // fewer tokens than n
      ("two words", 2),                              // exactly n tokens
      ("", 3),                                       // empty text → [""]
      ("   padded    whitespace   runs  ", 2),
      ("unicode café naïve 中文 token café naïve 中文 token", 3),
      ("x", 1))
    cases.foreach { case (text, n) =>
      val (native, columnApi) = both(text, n)
      assert(native == columnApi, s"mismatch for ($text, n=$n)")
    }
  }

  test("native shingles match on a random corpus, including order") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "x1", "y2", "café")
    (0 until 60).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val (native, columnApi) = both(text, 1 + rnd.nextInt(4))
      assert(native == columnApi, s"mismatch for: '$text'")
    }
  }

  test("keepDuplicates returns every sliding window in order") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.Bridge
    import spark.implicits._
    val out = Seq("a b a b a").toDF("t")
      .select(Bridge.column(graft.expressions.WordNGrams(
        Bridge.expression(split(col("t"), " ")), 2, keepDuplicates = true)).as("g"))
      .head.getSeq[String](0)
    assert(out == Seq("a b", "b a", "a b", "b a"))
  }

  test("top_ngram_chars is count × chars of the heaviest gram, 0 when short") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def top(text: String, n: Int): Long =
      Seq(text).toDF("t")
        .select(graft.llm.TextAnalysis.topNGramChars(col("t"), n).as("c"))
        .head.getLong(0)
    // "a b" occurs 3×, 3 chars each → 9; beats "b a" (2×3=6).
    assert(top("a b a b a b", 2) == 9L)
    // one token, n=2 → no windows
    assert(top("solo", 2) == 0L)
    assert(top("", 2) == 0L)
    // count×length tie-break: "xx yy" (2×5=10) beats "a b" (2×3=6)... both
    // occur twice; the heavier-by-chars gram wins.
    assert(top("xx yy a b xx yy a b", 2) > 6L)
  }

  test("word_ngrams is callable from SQL via the registered extension") {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.registerFunction(spark, "word_ngrams",
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(other.toString)
        }
        graft.expressions.WordNGrams(exprs.head, n)
      })
    val out = spark.sql(
      "SELECT word_ngrams(split('a b c', ' '), 2) AS g").head.getSeq[String](0)
    assert(out == Seq("a b", "b c"))
  }
}
