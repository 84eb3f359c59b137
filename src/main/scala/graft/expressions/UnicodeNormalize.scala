package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression (Spark has no built-in;
  * the usual fallback is a Scala UDF, which breaks whole-stage codegen and
  * serializes UTF8String⇄String per row even for pure-ASCII input).
  *
  * Corpus-curation motivation: the same visible text arrives composed
  * (U+00E9 "é") and decomposed (U+0065 U+0301 "e"+◌́) from different
  * sources; exact/MinHash/fingerprint dedup all hash the BYTES, so without
  * a normalization pass those are distinct documents. NFC before hashing
  * makes byte-level dedup match visible-text equality.
  *
  * Fast path matters at 100 TB: web corpora are overwhelmingly ASCII, and
  * ASCII is invariant under every normalization form — the shared kernel
  * detects ASCII with the zero-alloc numChars==numBytes check and returns
  * the input UTF8String untouched; only genuinely multi-byte strings pay
  * the String round-trip through `java.text.Normalizer` (ICU-equivalent
  * output: both implement Unicode UAX #15, so results match DuckDB's
  * `nfc_normalize` oracle byte-for-byte). */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  UnicodeNormalize.formOf(form) // validate eagerly: fail at construction

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"${prettyName} requires string, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = s"${form.toLowerCase}_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.UnicodeNormalize.normalize($c, "$form");""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  private[expressions] def formOf(form: String): Normalizer.Form = form match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  /** Shared eval/codegen kernel. ASCII (numChars == numBytes) returns the
    * input object unchanged — no allocation, no copy. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    if (s.numChars() == s.numBytes()) return s
    val str = s.toString
    val f = formOf(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}
