package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenization: string → array of subword tokens using a
  * trained [[graft.llm.Bpe.Encoder]].
  *
  * The merge table rides along as a REFERENCE OBJECT (same pattern as
  * [[PqEncode]]'s codebooks): `doGenCode` emits a single kernel call, so
  * the projection stays inside whole-stage codegen regardless of merge-
  * table size, and a 50k-merge vocabulary never appears in generated
  * source. A Scala UDF here would break codegen and pay UTF8String⇄String
  * conversion plus catalyst⇄scala array conversion per row on both sides;
  * this pays one String materialization per row (unavoidable — the merge
  * loop is inherently char-level) and writes tokens straight back as
  * UTF8String. */
case class BpeEncode(child: Expression, encoder: graft.llm.Bpe.Encoder)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def nullSafeEval(input: Any): Any =
    BpeEncode.encode(input.asInstanceOf[UTF8String], encoder)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val enc = ctx.addReferenceObj("bpeEncoder", encoder,
        classOf[graft.llm.Bpe.Encoder].getName)
      s"""${ev.value} = graft.expressions.BpeEncode.encode($c, $enc);"""
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared eval/codegen kernel. */
  def encode(s: UTF8String, encoder: graft.llm.Bpe.Encoder): GenericArrayData = {
    val toks = encoder.encodeDoc(s.toString)
    val out = new Array[AnyRef](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = UTF8String.fromString(toks(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
