package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}

/** Bit-position arithmetic for the md5-derived Bloom filter: position j of
  * item s is the first 13 hex chars (52 bits) of md5("j:s"), mod numBits.
  * The SAME arithmetic is expressible with `conv(substring(md5(...)))` in
  * Spark SQL (the distributed build path) and with
  * `('0x' || substr(md5(...), 1, 13))::BIGINT % m` in DuckDB — which is
  * the whole point: unlike Murmur-based `util.sketch.BloomFilter`, an
  * external SQL engine can rebuild the exact bitset and reproduce
  * membership answers INCLUDING the false positives. Sizing follows the
  * standard Bloom formulas (m = ⌈-n·ln(fpp)/ln²2⌉, k = max(1,
  * ⌊m/n·ln2 + 0.5⌋)), mirrored op for op by the oracle. */
object MdBloom {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Hex13(s: String): String = {
    val d = digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(14)
    var i = 0
    while (i < 7) { // 7 bytes = 14 hex chars; we keep 13
      val b = bytes(i) & 0xff
      sb.append(Character.forDigit(b >> 4, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
      i += 1
    }
    sb.substring(0, 13)
  }

  def position(j: Int, item: String, numBits: Long): Long =
    java.lang.Long.parseLong(md5Hex13(j + ":" + item), 16) % numBits

  def optimalNumBits(n: Long, fpp: Double): Long =
    math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong

  def optimalNumHashes(n: Long, numBits: Long): Int =
    math.max(1L, math.floor(numBits.toDouble / n * math.log(2) + 0.5).toLong).toInt
}

/** True iff ANY element of a string array is (possibly) in the md5-Bloom
  * bitset — all `numHashes` positions set. The bitset rides along as a
  * reference object like [[BloomAnyContain]]'s filter; each row is one
  * compiled loop with early exit per position probe, so a gram absent from
  * the filter costs ~1 md5 on average, not k. */
case class MdBloomAnyContain(child: Expression, bits: Array[Long],
                             numBits: Long, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md_bloom_any_contain requires array<string>, got ${other.sql}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "md_bloom_any_contain"

  def compute(input: ArrayData): Boolean = {
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val gram = input.getUTF8String(i).toString
        var j = 0
        var all = true
        while (all && j < numHashes) {
          val pos = MdBloom.position(j, gram, numBits)
          all = (bits((pos >> 6).toInt) & (1L << (pos & 63).toInt)) != 0
          j += 1
        }
        if (all) return true
      }
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("mdBloomAnyContain", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MdBloomAnyContain =
    copy(child = newChild)
}
