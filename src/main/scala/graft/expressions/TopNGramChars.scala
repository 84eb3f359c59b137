package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character coverage of the heaviest word n-gram in a token array:
  * max over distinct n-grams of (occurrences × gram code-point length) —
  * the numerator of the Gopher repetition rules' "fraction of characters
  * in the most common n-gram" (Rae et al. 2021, App. A1.1; count×length
  * makes the tie-break deterministic and engine-portable).
  *
  * This is a PER-DOCUMENT metric, so the scale-correct formulation is
  * row-local: one compiled pass builds the gram counts in a per-row hash
  * map and returns a scalar — zero shuffle, zero explode. The relational
  * alternative (explode all grams → groupBy(doc, gram) → max) ships every
  * gram of a 100 TB corpus through an exchange to compute numbers that
  * never leave their row. The DuckDB oracle mirrors exactly that
  * relational form — same result, different plan — which is what makes
  * the query hash-checkable.
  *
  * Contract: fewer than n tokens → 0 (no windows exist; NOT the shingle
  * contract's joined-remainder gram). Null tokens are skipped inside a
  * gram like `concat_ws`. Null array → null. */
case class TopNGramChars(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"top_ngram_chars needs n >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_ngram_chars requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "top_ngram_chars"

  private val space = UTF8String.fromString(" ")

  def compute(input: ArrayData): Long = {
    val count = input.numElements() - (n - 1)
    if (count <= 0) return 0L
    val counts = new java.util.HashMap[UTF8String, Int](count)
    var i = 0
    while (i < count) {
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = i
      while (j < i + n) {
        if (!input.isNullAt(j)) parts.add(input.getUTF8String(j))
        j += 1
      }
      val gram = UTF8String.concatWs(space,
        parts.toArray(new Array[UTF8String](parts.size())): _*)
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    var best = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val chars = e.getValue.toLong * e.getKey.numChars()
      if (chars > best) best = chars
    }
    best
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("topNGramChars", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): TopNGramChars =
    copy(child = newChild)
}
