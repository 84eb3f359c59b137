package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-n-gram expression over a token array — the shingle
  * kernel under MinHash near-dup, n-gram Jaccard, and benchmark
  * decontamination. The Column-API formulation —
  * `array_distinct(transform(sequence(0, count-1), i => concat_ws(" ",
  * slice(toks, i+1, n))))` — is a higher-order-function lambda that
  * Catalyst interprets PER ELEMENT and that drops the enclosing project out
  * of whole-stage codegen; on a shingle explode of a 100 TB corpus that
  * interpreter tax is paid per token. This expression computes the
  * identical result (bit-identical grams, same first-occurrence order as
  * `array_distinct`) in one compiled pass per row.
  *
  * Semantics, matching the prior formulation exactly:
  *   - fewer than n tokens (including an empty array) → one gram: all
  *     tokens joined by ' ' (empty string for no tokens);
  *   - otherwise the sliding n-token windows joined by ' ', de-duplicated
  *     preserving first occurrence;
  *   - null tokens are skipped inside a gram like `concat_ws`;
  *   - null array → null.
  *
  * `keepDuplicates = true` returns EVERY sliding window in order (no
  * dedup) — the multiplicity-preserving variant that repetition metrics
  * (top-n-gram character fraction) need, where the distinct set used by
  * shingling would erase exactly the signal being measured. */
case class WordNGrams(child: Expression, n: Int,
                      keepDuplicates: Boolean = false) extends UnaryExpression {
  require(n >= 1, s"word_ngrams needs n >= 1, got $n")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_ngrams requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  private val space = UTF8String.fromString(" ")

  // concat_ws(" ", ...) over arr[start, start+len): null elements skipped.
  private def joinRange(arr: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new java.util.ArrayList[UTF8String](len)
    var i = start
    val end = start + len
    while (i < end) {
      if (!arr.isNullAt(i)) parts.add(arr.getUTF8String(i))
      i += 1
    }
    UTF8String.concatWs(space, parts.toArray(new Array[UTF8String](parts.size())): _*)
  }

  def compute(input: ArrayData): ArrayData = {
    val numToks = input.numElements()
    val count = numToks - (n - 1)
    if (count <= 0)
      return new GenericArrayData(Array[Any](joinRange(input, 0, numToks)))
    if (keepDuplicates) {
      val out = new Array[Any](count)
      var i = 0
      while (i < count) {
        out(i) = joinRange(input, i, n)
        i += 1
      }
      return new GenericArrayData(out)
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < count) {
      seen.add(joinRange(input, i, n))
      i += 1
    }
    new GenericArrayData(
      seen.toArray(new Array[AnyRef](seen.size())).asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  // One compiled call per row (the reference object is this expression);
  // stays inside whole-stage codegen, unlike a higher-order-function lambda.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("wordNGrams", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}
