package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native integer squared-L2 distance Σ (aᵢ − bᵢ)² over two long/int
  * arrays — the exact-arithmetic workhorse behind every DetKMeans
  * assignment (purity, silhouette, elbow, IVF/PQ training and probes).
  *
  * Why an Expression (the [[FloatDot]] rationale, integer flavor): the
  * `aggregate(zip_with(...))` Column formulation this replaces routes
  * through ArrayAggregate/ZipWith, which are NOT whole-stage-codegen
  * expressions — every scored row pays interpreted lambda dispatch per
  * element, and allocates the zipped intermediate array. A native loop
  * is constant code size, allocation-free, JIT-vectorizes, and keeps
  * the k-means scoring stage inside WholeStageCodegen.
  *
  * Contract: each input independently `array<long|int>`; accumulation
  * is EXACT Long arithmetic (callers quantize to ≤ ~10⁷ units, so a
  * 64-dim sum tops out near 2⁵⁴ — overflow is the caller's contract,
  * exactly as with the lambda fold). A null array, a null element, or
  * a LENGTH MISMATCH yields NULL — identical to the zip_with padding
  * semantics it replaces (zip_with pads the short side with nulls, and
  * null poisons the aggregate). */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType | IntegerType, _),
            ArrayType(LongType | IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"long_sq_dist requires array<long|int> on both sides, got $other")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_sq_dist"

  private def getterOf(e: Expression): String = e.dataType match {
    case ArrayType(IntegerType, _) => "getInt"
    case _ => "getLong"
  }

  private def readAt(e: Expression, a: ArrayData, i: Int): Long =
    e.dataType match {
      case ArrayType(IntegerType, _) => a.getInt(i).toLong
      case _ => a.getLong(i)
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = readAt(left, x, i) - readAt(right, y, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      val gl = getterOf(left)
      val gr = getterOf(right)
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  long $d = (long) $a.$gl($i) - (long) $b.$gr($i);
         |  $acc += $d * $d;
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}
