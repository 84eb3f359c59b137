package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** True iff ANY element of a string array might be in the Bloom filter.
  * The filter rides along as a reference object (it serializes with the
  * expression to every executor once, like a broadcast), and each row is
  * one compiled loop with early exit — no explode, no join, no shuffle.
  *
  * This is the at-scale variant of a broadcast semi-join probe: an exact
  * distinct-gram relation stops being broadcastable somewhere in the
  * gigabytes, while a Bloom filter over the same grams is
  * `-n·ln(fpp)/ln²2` BITS per item (~1.2 MB per million grams at 1% fpp)
  * with one-sided error — no false negatives, so a contaminated document
  * is NEVER missed; fpp only controls how many clean documents get a
  * second look. Membership bytes match
  * `DataFrameStatFunctions.bloomFilter` on a string column (both sides
  * hash the UTF-8 bytes). */
case class BloomAnyContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_any_contain requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_any_contain"

  def compute(input: ArrayData): Boolean = {
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i) &&
          bloom.mightContainBinary(input.getUTF8String(i).getBytes)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bloomAnyContain", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomAnyContain =
    copy(child = newChild)
}
