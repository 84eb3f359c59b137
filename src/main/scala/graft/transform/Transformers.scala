package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar transform library.
  *
  * Semantic parity with the reference's per-cell transformer functions
  * (reference: app/services/transformers.py:11-306), re-expressed as pure
  * `Column => Column` builders. Everything here compiles to built-in Catalyst
  * expressions (`when`/`coalesce`/`to_date`/`regexp_*`/`cast`), so the whole
  * library stays inside whole-stage codegen — no UDFs, no serialization
  * boundary, and constant-folding collapses the sentinel literal trees.
  *
  * Null/sentinel semantics are type-dependent and deliberately asymmetric
  * (e.g. "*" is NULL for NUMERIC/DATE but preserved for TEXT); each builder
  * documents its exact contract.
  */
object Transformers {

  /** Sentinels nulled by parse_date (transformers.py:29). */
  private val DateSentinels = Seq("*", "", "NULL", "N/A", "nan", "NaN")

  /** Sentinels nulled by parse_numeric (transformers.py:66). */
  private val NumericSentinels = Seq("", "NULL", "N/A", "*", "nan", "NaN")

  /** Sentinels nulled by TEXT transform — note "*" is NOT here
    * (transformers.py:154-158); "" handled separately. */
  private val TextSentinels = Seq("NULL", "N/A", "nan", "NaN")

  /** clean_code compares sentinels AFTER upper-casing (transformers.py:131-137),
    * so lowercase "nan"/"NaN" literals can never match — the effective set is
    * only these three. Bug-compatible on purpose. */
  private val CodeSentinels = Seq("", "NULL", "N/A")

  /** Date formats tried in order (transformers.py:36). Java patterns use
    * single M/d so that, like Python strptime, unpadded "1/2/2024" parses. */
  private val DateFormats = Seq("yyyyMMdd", "M/d/yyyy", "yyyy-M-d", "yyyy/M/d", "M-d-yyyy")

  /** F1 parse_date: sentinel → NULL, else first format that parses wins,
    * else NULL. Requires CORRECTED time-parser policy (Spark 3+/4 default)
    * so invalid calendar dates null out instead of leniently rolling over.
    * Reference: transformers.py:11-43. */
  def parseDate(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t.isin(DateSentinels: _*), lit(null).cast(DateType))
      .otherwise(coalesce(DateFormats.map(f => to_date(t, f)): _*))
  }

  /** F2 parse_numeric: sentinel → NULL; strip ALL commas; float-parse else
    * NULL (string→double cast yields NULL on garbage with ANSI off).
    * Reference: transformers.py:46-75. */
  def parseNumeric(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t.isin(NumericSentinels: _*), lit(null).cast(DoubleType))
      .otherwise(regexp_replace(t, ",", "").cast(DoubleType))
  }

  /** F3 parse_integer: parse_numeric then truncate toward zero. Long (not
    * Int) so >2^31 values survive — reference Python ints are unbounded.
    * NaN/±Inf → NULL (Python int(nan) raises; cast-to-long would give 0).
    * Reference: transformers.py:78-91. */
  def parseInteger(c: Column): Column = {
    val d = parseNumeric(c)
    when(isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity,
      lit(null).cast(LongType)).otherwise(d.cast(LongType))
  }

  /** F4 parse_boolean: {"1","true","yes","y","*"}→true,
    * {"0","false","no","n",""}→false, else NULL.
    * Reference: transformers.py:94-118. */
  def parseBoolean(c: Column): Column = {
    val t = lower(trim(c))
    when(c.isNull, lit(null).cast(BooleanType))
      .when(t.isin("1", "true", "yes", "y", "*"), lit(true))
      .when(t.isin("0", "false", "no", "n", ""), lit(false))
      .otherwise(lit(null).cast(BooleanType))
  }

  /** F5 clean_code: strip+UPPER, then sentinel → NULL. Preserves leading
    * zeros (string in, string out). Reference: transformers.py:121-140. */
  def cleanCode(c: Column): Column = {
    val u = upper(trim(c))
    when(c.isNull || u.isin(CodeSentinels: _*), lit(null).cast(StringType))
      .otherwise(u)
  }

  /** F6 transform_value for TEXT: strip; "" and exact-case sentinels → NULL;
    * everything else (including "*") preserved. Reference: transformers.py:154-158. */
  def transformText(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "" || t.isin(TextSentinels: _*), lit(null).cast(StringType))
      .otherwise(t)
  }

  /** Unknown-type fallback: strip, ""→NULL, sentinels KEPT.
    * Reference: transformers.py:167-172. */
  def transformUnknown(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "", lit(null).cast(StringType)).otherwise(t)
  }

  /** F7 transform_value dispatch by logical type name.
    * Reference: transformers.py:143-172. */
  def transformValue(c: Column, dataType: String): Column = dataType match {
    case "TEXT"    => transformText(c)
    case "NUMERIC" => parseNumeric(c)
    case "INTEGER" => parseInteger(c)
    case "DATE"    => parseDate(c)
    case "BOOLEAN" => parseBoolean(c)
    case _         => transformUnknown(c)
  }

  /** F8 parse_mai_id: leading digits of the (stripped) MAI *description*;
    * valid only if ∈ {1,2,3}. Reference: transformers.py:180-207. */
  def parseMaiId(c: Column): Column = {
    val digits = regexp_extract(trim(c), "^(\\d+)", 1)
    val n = when(digits === "", lit(null).cast(LongType)).otherwise(digits.cast(LongType))
    when(n.isin(1L, 2L, 3L), n).otherwise(lit(null).cast(LongType))
  }

  /** F9 parse_mue_value: ""/NULL/N-A (case-insensitive) → NULL; else
    * int(float(v)) with 0 preserved as a VALID value. NaN/Inf guard keeps
    * parity with Python's int(float("nan")) raising → NULL.
    * Reference: transformers.py:210-233. */
  def parseMueValue(c: Column): Column = {
    val t = trim(c)
    val d = regexp_replace(t, ",", "").cast(DoubleType)
    when(c.isNull || t === "" || upper(t).isin("NULL", "N/A"), lit(null).cast(LongType))
      .when(isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity,
        lit(null).cast(LongType))
      .otherwise(d.cast(LongType))
  }

  /** F10 parse_deletion_date: "*" or empty → NULL (edit still active), else
    * parse_date. Reference: transformers.py:241-256. */
  def parseDeletionDate(c: Column): Column =
    when(c.isNull || trim(c) === "*" || trim(c) === "", lit(null).cast(DateType))
      .otherwise(parseDate(c))

  /** F11 parse_modifier_indicator: if first char is a digit in {0,1,9} →
    * that digit (handles header-contaminated cells like "0=not allowed…");
    * else fall back to parse_integer. Reference: transformers.py:259-286. */
  def parseModifierIndicator(c: Column): Column = {
    val first = substring(trim(c), 1, 1)
    when(first.isin("0", "1", "9"), first.cast(LongType))
      .otherwise(parseInteger(c))
  }

  /** F12 parse_prior_1996_flag: NULL→NULL; "*"→true; else false.
    * Reference: transformers.py:289-306. */
  def parsePrior1996Flag(c: Column): Column =
    when(c.isNull, lit(null).cast(BooleanType)).otherwise(trim(c) === "*")

  /** F14 version-label / quarter-start effective-date builders.
    * Reference: app/routers/upload.py:119-128. */
  def versionLabel(year: Column, quarter: Column): Column =
    concat(year.cast(StringType), lit("-Q"), quarter.cast(StringType))

  def quarterStartDate(year: Column, quarter: Column): Column =
    make_date(year, (quarter - 1) * 3 + 1, lit(1))

  /** F15 Medicare fee formula: round(((work*wg + pe*pg + mp*mg) * cf), 2),
    * with the OPPS variant capped via least(fee, cap). Decimal arithmetic so
    * results are exact and order-independent (safe to aggregate at scale).
    * Reference: SCHEMA.md:248-265 (flagship query), 62-64 (formula). */
  def fee(workRvu: Column, workGpci: Column, peRvu: Column, peGpci: Column,
          mpRvu: Column, mpGpci: Column, conversionFactor: Column): Column = {
    val d = (c: Column) => c.cast(DecimalType(20, 6))
    round((d(workRvu) * d(workGpci) + d(peRvu) * d(peGpci) + d(mpRvu) * d(mpGpci))
      * d(conversionFactor), 2)
  }

  def cappedFee(fee: Column, cap: Column): Column = least(fee, cap)
}
