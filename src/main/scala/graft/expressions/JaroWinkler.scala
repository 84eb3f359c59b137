package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity (Jaro 1989; Winkler 1990 prefix boost) scaled
  * to an EXACT 4-dp integer in [0, 10000] — the record-linkage scorer the
  * US Census built for person/entity name matching, and the standard
  * verify step after a blocking join in entity resolution.
  *
  * Exactness is the point of this kernel: jaro = (m/|a| + m/|b| +
  * (m − t)/m) / 3 is a small-denominator rational, so the kernel clears
  * denominators and computes `floor(jw·10⁴ + ½)` entirely in 64-bit
  * integers — no float ever forms, so the score cannot drift by an ulp
  * across engines, platforms, or evaluation orders (the half-up boundary
  * is decided by integer division, not by which side of a double's
  * rounding error the value landed on). With t = k/2 half-transpositions
  * and the Winkler boost jw = j + ℓ·0.1·(1−j) (ℓ = common prefix ≤ 4,
  * applied only when j > 0.7 — the threshold DuckDB/RapidFuzz use), the
  * cleared form is jw = ((10−ℓ)·N + ℓ·D) / (10·D) with
  * N = 2·m²·(|a|+|b|) + (2m−k)·|a|·|b| and D = 6·m·|a|·|b|.
  *
  * Native expression (static kernel called from generated code): stays
  * inside whole-stage codegen, no UTF8String⇄String conversion, O(|a|·w)
  * time and O(|a|+|b|) scratch per row. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler requires (string, string), got $other")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "jaro_winkler4"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim4(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.JaroWinkler.sim4($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Inputs whose longer side stays ≤ this many UTF-16 code units score
    * entirely in Long arithmetic (num·20000 ≤ 1.2·10⁶·L³ < 2⁶³ holds
    * with a wide margin at 10⁴); longer inputs take an exact BigInt
    * path — same value, no silent overflow. */
  val LongSafeLen = 10000

  /** floor(jaro_winkler(a, b) · 10000 + 0.5) as an exact integer.
    *
    * Semantics note: lengths, match positions, and the prefix compare
    * UTF-16 CODE UNITS (Java `String.charAt`), so a non-BMP character
    * (surrogate pair) counts as two units — matching DuckDB/RapidFuzz
    * only on BMP text; byte- or codepoint-based implementations diverge
    * on astral-plane input. */
  def sim4(ua: UTF8String, ub: UTF8String): Long = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    // Either side empty → 0 (DuckDB's convention, empty-empty included).
    if (la == 0 || lb == 0) return 0L
    if (a == b) return 10000L
    // Match window: floor(max/2) − 1, never negative.
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0L
    // k = positions where the matched subsequences disagree (2t).
    var k = 0
    var bi = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(bi)) bi += 1
        if (a.charAt(i) != b.charAt(bi)) k += 1
        bi += 1
      }
      i += 1
    }
    // Winkler boost only above the standard 0.7 threshold (N/D > 7/10).
    var prefix = 0
    while (prefix < math.min(4, math.min(la, lb)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    val mL = m.toLong
    if (math.max(la, lb) <= LongSafeLen) {
      // jaro = N / D exactly, with D = 6·m·la·lb.
      val n = 2L * mL * mL * (la + lb) + (2L * mL - k) * la * lb
      val d = 6L * mL * la.toLong * lb
      val (num, den) =
        if (prefix > 0 && 10L * n > 7L * d)
          ((10L - prefix) * n + prefix * d, 10L * d)
        else (n, d)
      // floor(num/den · 10⁴ + ½) in pure integer arithmetic.
      (num * 20000L + den) / (2L * den)
    } else {
      // Long inputs: num·20000 grows as ~1.2e6·L³ and would overflow a
      // Long past L ≈ 2·10⁴ code units — same formulas through BigInt
      // (rare path: similarity scoring of book-length strings).
      val n = BigInt(2) * mL * mL * (la + lb) +
        (BigInt(2) * mL - k) * la * lb
      val d = BigInt(6) * mL * la * lb
      val (num, den) =
        if (prefix > 0 && 10 * n > 7 * d)
          (BigInt(10 - prefix) * n + BigInt(prefix) * d, 10 * d)
        else (n, d)
      ((num * 20000 + den) / (2 * den)).toLong
    }
  }
}
