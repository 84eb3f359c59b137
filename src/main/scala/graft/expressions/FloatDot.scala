package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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
  * Contract: each input independently `array<float|double|int|long>`
  * (mixed sides allowed — an embedding column against literal double
  * hyperplanes, or int8-quantized codes against each other). A null
  * array, a null element, or a LENGTH MISMATCH yields NULL — the unrolled
  * formulation this replaces nulled out on short arrays via element_at,
  * and a silent min-length dot would instead hand a truncated-but-
  * plausible similarity to downstream dedup. */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType | IntegerType | LongType, _),
            ArrayType(FloatType | DoubleType | IntegerType | LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"float_dot requires array<float|double|int|long> on both sides, got $other")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  private def getterOf(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(IntegerType, _) => "getInt"
    case ArrayType(LongType, _) => "getLong"
    case _ => "getDouble"
  }

  private def readAt(e: Expression, a: ArrayData, i: Int): Double =
    e.dataType match {
      case ArrayType(FloatType, _) => a.getFloat(i).toDouble
      case ArrayType(IntegerType, _) => a.getInt(i).toDouble
      case ArrayType(LongType, _) => a.getLong(i).toDouble
      case _ => a.getDouble(i)
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += readAt(left, x, i) * readAt(right, y, i)
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
      val gl = getterOf(left)
      val gr = getterOf(right)
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |boolean $bad = $n != $b.numElements();
         |for (int $i = 0; !$bad && $i < $n; $i++) {
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
