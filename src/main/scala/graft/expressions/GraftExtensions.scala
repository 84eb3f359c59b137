package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering the engine's native expressions
  * on the SQL surface, so `spark.sql("SELECT rolling_hash64(...)")` works
  * next to the Column API. Activate with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "rolling_hash64 takes exactly one argument")
        RollingHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "nfc_normalize takes exactly one argument")
        UnicodeNormalize(exprs.head, "NFC")
      }))
    ext.injectFunction((
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_ngrams takes (tokens, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams n must be an integer literal, got $other")
        }
        WordNGrams(exprs.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "float_dot takes (array, array)")
        FloatDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("long_sq_dist"),
      new ExpressionInfo(classOf[LongSqDist].getName, "long_sq_dist"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "long_sq_dist takes (array, array)")
        LongSqDist(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "deflate_len takes exactly one argument")
        DeflateLen(exprs.head)
      }))
  }
}
