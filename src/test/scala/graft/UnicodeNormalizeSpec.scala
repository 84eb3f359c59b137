package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import graft.llm.TextAnalysis

/** Native unicode normalization: NFC composes decomposed sequences, NFKC
  * folds compatibility characters, ASCII passes through untouched, and the
  * SQL registration agrees with the Column API. Byte forms are spelled as
  * escapes throughout — composed "café" (4 code points) vs decomposed
  * "café" (5) — because the two render identically. */
class UnicodeNormalizeSpec extends SparkSpecBase {
  import spark.implicits._

  private val composed = "caf\u00e9"
  private val decomposed = "cafe\u0301"

  private def norm(s: String, form: String = "NFC"): String =
    Seq(s).toDF("v")
      .select(TextAnalysis.unicodeNormalize(col("v"), form).as("n"))
      .head.getString(0)

  test("NFC composes decomposed sequences to the composed form") {
    assert(norm(decomposed) == composed)
    assert(norm(decomposed).length == 4)
  }

  test("ASCII and already-NFC strings are unchanged") {
    assert(norm("plain ascii text 123") == "plain ascii text 123")
    assert(norm(composed) == composed)
  }

  test("NFKC folds compatibility characters, NFD decomposes") {
    assert(norm("\ufb01le", "NFKC") == "file") // fi ligature
    assert(norm(composed, "NFD") == decomposed)
  }

  test("nulls propagate; unknown form fails at construction") {
    val out = Seq[(Integer, String)]((1, null)).toDF("id", "v")
      .select(TextAnalysis.unicodeNormalize(col("v")).as("n")).head
    assert(out.isNullAt(0))
    intercept[IllegalArgumentException] {
      TextAnalysis.unicodeNormalize(lit("x"), "NFX")
    }
  }

  test("normalization makes byte-level dedup match visible-text equality") {
    // The curation motivation: same visible text, different byte encodings
    // — exact dedup by md5 only collapses them after NFC.
    val df = Seq((1L, composed + " story"), (2L, decomposed + " story"))
      .toDF("doc_id", "text")
    val raw = df.select(md5(col("text")).as("h")).distinct().count()
    val nfc = df.select(md5(TextAnalysis.unicodeNormalize(col("text"))).as("h"))
      .distinct().count()
    assert(raw == 2 && nfc == 1)
  }

  test("nfc_normalize is callable from SQL and matches the Column API") {
    val s2 = spark.newSession()
    Bridge.registerFunction(s2, "nfc_normalize",
      exprs => graft.expressions.UnicodeNormalize(exprs.head, "NFC"))
    val viaSql = s2.sql(s"SELECT nfc_normalize('cafe\u0301') AS n").head.getString(0)
    assert(viaSql == composed)
  }
}
