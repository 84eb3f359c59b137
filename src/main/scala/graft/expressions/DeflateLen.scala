package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string — the kernel behind the
  * compression-ratio quality signal (Dolma/RedPajama-class pipelines drop
  * documents whose bytes compress "too well": machine-generated or
  * template-repeated text has ratio ≪ natural prose).
  *
  * Native expression rather than a UDF for the usual reasons (stays inside
  * whole-stage codegen, no UTF8String⇄String conversion), with the actual
  * work in a static kernel the generated code calls — the compressor is a
  * JNI call already, so there is nothing to gain from inlining bytes into
  * generated Java, and the kernel reuses a thread-local `Deflater` instead
  * of allocating one (native zlib state) per row.
  *
  * Determinism: fixed level 6, raw-deflate (nowrap), single `deflate` pass
  * over the whole input — same bytes in, same length out, every row, every
  * executor (zlib's output for a fixed level/strategy is deterministic;
  * the JDK bundles zlib on every platform this engine targets). Not
  * reproducible in SQL engines without a compress() — rows-only query with
  * the properties spec-pinned instead. */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"deflate_len requires string, got ${other.sql}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(input: Any): Any =
    DeflateLen.compressedLen(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.DeflateLen.compressedLen($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, true)
  }
  private val scratch = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** Raw-deflate length of the UTF-8 bytes. Only the LENGTH leaves this
    * method — compressed output goes to a reused scratch buffer. */
  def compressedLen(s: UTF8String): Int = {
    val in = s.getBytes
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = scratch.get()
    var total = 0
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}
