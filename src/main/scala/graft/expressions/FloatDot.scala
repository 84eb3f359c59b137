package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float/double arrays, accumulating in
  * ascending-index order (bit-identical to the unrolled
  * `Σ element_at(a,i)·element_at(b,i)` Column formulation it replaces).
  *
  * Why an Expression: the unrolled 64-term reduce is ONE Java expression
  * tree — codegen cannot split a single expression across methods, so any
  * stage that combines it with a sort/join pipeline blows Janino's 64 KB
  * method limit and silently drops the WHOLE stage to interpreted eval
  * (observed on the SemDeDup pair join). A loop is constant code size at
  * any dimension, JIT-vectorizes, and keeps the stage inside whole-stage
  * codegen.
  *
  * Contract: each input independently `array<float>` or `array<double>`
  * (mixed sides allowed — an embedding column against literal double
  * hyperplanes is the common case); the shorter length bounds the loop
  * (fixed-dim embeddings are equal-length by construction); a null array
  * or null element yields NULL. */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_dot requires array<float|double> on both sides, got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  private def isFloat(e: Expression) = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc +=
        (if (lf) x.getFloat(i).toDouble else x.getDouble(i)) *
          (if (rf) y.getFloat(i).toDouble else y.getDouble(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val gl = if (isFloat(left)) "getFloat" else "getDouble"
      val gr = if (isFloat(right)) "getFloat" else "getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  $acc += (double) $a.$gl($i) * (double) $b.$gr($i);
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}
