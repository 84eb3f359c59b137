package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-token hash helpers callable from generated code (static forwarders
  * make `graft.expressions.HashHelpers.md5Prefix7(s)` valid Java). */
object HashHelpers {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Integer value of the first 7 hex digits of md5(token bytes) — the
    * engine-portable token hash: any engine with an md5 function and
    * hex-to-int cast reproduces it (DuckDB:
    * `CAST(('0x' || substr(md5(t),1,7)) AS BIGINT)`). 28 bits, so the
    * rolling fold below never overflows a signed 64-bit intermediate. */
  def md5Prefix7(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xf0L) >> 4)
  }
}

/** Native rolling polynomial hash over a token array: the custom-Expression
  * tier of the engine's preference order (compose built-ins > custom
  * Expression > UDF). The Column-API formulation of this fold —
  * `aggregate(tokens, 0L, (acc, t) => pmod(acc*31 + pmod(xxhash64(t), p), p))`
  * — is a higher-order-function lambda, which Catalyst interprets per
  * ELEMENT and which blocks whole-stage codegen for the enclosing stage.
  * This expression evaluates the identical fold (same xxhash64 seed 42,
  * same wrap-then-positive-mod arithmetic, bit-identical results) as one
  * tight generated loop inside codegen.
  *
  * Semantics: acc_0 = 0; acc_i = pmod(acc_{i-1} * 31 + pmod(xxh64(t_i), p), p)
  * with p = 2^61 - 1; null tokens hash like Spark's xxhash64(null) (the
  * seed). Null array → null.
  *
  * `portable = true` swaps the per-token hash for [[HashHelpers.md5Prefix7]]
  * and the modulus for 2^31 - 1, so the identical fold is expressible in
  * DuckDB as `list_reduce(...)` over md5 prefixes — the variant the oracle
  * checks end-to-end. Same codegen'd loop either way. */
case class RollingHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression {

  private val P =
    if (portable) 2147483647L // 2^31 - 1: acc*31 + v fits any engine's int64
    else 2305843009213693951L // 2^61 - 1

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash64 requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h0 =
        if (arr.isNullAt(i)) 42L
        else {
          val s = arr.getUTF8String(i)
          if (portable) HashHelpers.md5Prefix7(s)
          else XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      var h = h0 % P; if (h < 0) h += P
      var t = acc * 31L + h
      t = t % P; if (t < 0) t += P
      acc = t
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      val t = ctx.freshName("t")
      val s = ctx.freshName("s")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h;
         |  if ($c.isNullAt($i)) {
         |    $h = 42L;
         |  } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    $h = ${if (portable)
                  s"graft.expressions.HashHelpers.md5Prefix7($s)"
                else
                  s"org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(" +
                    s"$s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L)"};
         |  }
         |  $h = $h % ${P}L; if ($h < 0) $h += ${P}L;
         |  long $t = $acc * 31L + $h;
         |  $t = $t % ${P}L; if ($t < 0) $t += ${P}L;
         |  $acc = $t;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}
