package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization encoder: for each of `m` subspaces, the
  * 0-based index of the nearest codebook centroid (squared L2, ties → the
  * LOWEST index — first strict minimum, matching
  * `array_position(dists, array_min(dists))` on the equivalent Column
  * formulation).
  *
  * Why an Expression and not composed built-ins: the unrolled Column
  * formulation is an m×k×subDim-term tree (2,048 terms at the default
  * 8×16×16) whose analysis + whole-stage-codegen compile costs several
  * SECONDS per distinct codebook — paid again on every re-fit. Here the
  * codebook rides along as a flat `Array[Double]` REFERENCE OBJECT (never
  * in the generated source), and `doGenCode` emits one tight triple loop:
  * compile cost is constant in m/k/dim, runtime is the same
  * scan-side-projection with no shuffle, and the JIT sees a plain
  * array-indexed loop it can vectorize.
  *
  * Contract: input `array<float>` or `array<double>`; elements widen to
  * double and distances accumulate in ascending-dimension order, so codes
  * are bit-identical to the unrolled formulation. A null array, an array
  * shorter than m·subDim, or a null element yields NULL (the fixed-dim
  * embedding contract is violated) rather than a half-defined code. */
case class PqEncode(child: Expression, m: Int, k: Int, subDim: Int,
                    flatCodebooks: Array[Double]) extends UnaryExpression {

  require(flatCodebooks.length == m * k * subDim,
    s"codebook length ${flatCodebooks.length} != m*k*subDim (${m * k * subDim})")

  private val dim = m * subDim

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<float> or array<double>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  // Lazy: child.dataType is only callable once the plan is resolved.
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() < dim) return null
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var dist = 0.0
        var d = 0
        val base = (j * k + c) * subDim
        while (d < subDim) {
          val v = if (isFloat) arr.getFloat(j * subDim + d).toDouble
                  else arr.getDouble(j * subDim + d)
          val x = v - flatCodebooks(base + d)
          dist += x * x
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cb = ctx.addReferenceObj("pqCodebooks", flatCodebooks, "double[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val cc = ctx.freshName("c")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val dist = ctx.freshName("dist")
      val base = ctx.freshName("base")
      val x = ctx.freshName("x")
      val bad = ctx.freshName("bad")
      val getter = if (isFloat) s"(double) $c.getFloat" else s"$c.getDouble"
      s"""
         |boolean $bad = $c.numElements() < $dim;
         |if (!$bad) {
         |  for (int $i = 0; $i < $dim; $i++) {
         |    if ($c.isNullAt($i)) { $bad = true; break; }
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $codes = new int[$m];
         |  for (int $j = 0; $j < $m; $j++) {
         |    int $best = 0;
         |    double $bestD = Double.POSITIVE_INFINITY;
         |    for (int $cc = 0; $cc < $k; $cc++) {
         |      double $dist = 0.0;
         |      int $base = ($j * $k + $cc) * $subDim;
         |      for (int $d = 0; $d < $subDim; $d++) {
         |        double $x = $getter($j * $subDim + $d) - $cb[$base + $d];
         |        $dist += $x * $x;
         |      }
         |      if ($dist < $bestD) { $bestD = $dist; $best = $cc; }
         |    }
         |    $codes[$j] = $best;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}
