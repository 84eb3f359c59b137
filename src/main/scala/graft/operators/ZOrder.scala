package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two columns
  * so that range-partitioning + sorting on the combined key keeps BOTH
  * dimensions' per-file min/max statistics tight. This is the multi-
  * dimensional clustering pass (the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * analogue) a 100 TB table needs so parquet row-group pruning works for
  * predicates on either column, not just the lead sort key — a table
  * sorted by x alone answers y-filters with a full scan.
  *
  * The z-value is a pure unrolled bit expression (shift/and/or), fully
  * inside whole-stage codegen; no UDF, no shuffle beyond the single
  * repartitionByRange a layout rewrite needs anyway.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns: x occupies even output bits, y odd. Inputs are masked to
    * `bits` bits (callers normalize wider domains first — e.g. `pmod`, or
    * rank-bucketing for continuous values). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1L), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** The same z-value as a DuckDB SQL expression over `xExpr`/`yExpr` —
    * generated so the oracle's bit arithmetic cannot drift from
    * [[zValue]]. */
  def zValueSql(xExpr: String, yExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(s"(((CAST(($xExpr) AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST(($yExpr) AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
  }

  /** Rewrite a relation into z-order layout: range-partition on the Morton
    * key into `numPartitions` output files and sort within each, so every
    * file covers a compact square-ish region of (x, y) space and carries
    * tight min/max stats on BOTH columns. The helper column is dropped —
    * the layout survives in the file/row-group ordering. */
  def layout(df: DataFrame, xCol: String, yCol: String, bits: Int,
             numPartitions: Int): DataFrame =
    df.withColumn("_zorder", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
}
