package graft

import java.sql.Date

import graft.transform.Transformers._

/** Port of the reference's transformer unit suite
  * (reference: tests/test_transformers.py:26-273), one assertion per case. */
class TransformersSpec extends SparkSpecBase {

  private def d(s: String): Date = Date.valueOf(s)

  // ---- parse_date (test_transformers.py:26-51)
  test("parse_date yyyyMMdd") {
    assert(eval("20240101", parseDate) == d("2024-01-01"))
    assert(eval("20231215", parseDate) == d("2023-12-15"))
  }
  test("parse_date MM/dd/yyyy") {
    assert(eval("01/15/2024", parseDate) == d("2024-01-15"))
    assert(eval("12/31/2023", parseDate) == d("2023-12-31"))
  }
  test("parse_date ISO") {
    assert(eval("2024-01-15", parseDate) == d("2024-01-15"))
  }
  test("parse_date extra formats yyyy/MM/dd and MM-dd-yyyy") {
    assert(eval("2024/01/15", parseDate) == d("2024-01-15"))
    assert(eval("01-15-2024", parseDate) == d("2024-01-15"))
  }
  test("parse_date sentinels -> null") {
    for (s <- Seq("", "*", "NULL", "N/A", "nan", "NaN", null))
      assert(eval(s, parseDate) == null, s"input '$s'")
  }
  test("parse_date invalid -> null (strict calendar)") {
    assert(eval("not a date", parseDate) == null)
    assert(eval("13/45/2024", parseDate) == null)
  }

  // ---- parse_numeric (test_transformers.py:54-89)
  test("parse_numeric ints and floats") {
    assert(eval("123", parseNumeric) == 123.0)
    assert(eval("0", parseNumeric) == 0.0)
    assert(eval("123.45", parseNumeric) == 123.45)
    assert(eval("0.5", parseNumeric) == 0.5)
  }
  test("parse_numeric comma separated") {
    assert(eval("1,234", parseNumeric) == 1234.0)
    assert(eval("1,234,567.89", parseNumeric) == 1234567.89)
  }
  test("parse_numeric sentinels -> null") {
    for (s <- Seq("", "*", "NULL", "N/A", null))
      assert(eval(s, parseNumeric) == null, s"input '$s'")
  }
  test("parse_numeric invalid -> null") {
    assert(eval("abc", parseNumeric) == null)
    assert(eval("12.34.56", parseNumeric) == null)
  }
  test("parse_numeric whitespace") {
    assert(eval("  123  ", parseNumeric) == 123.0)
    assert(eval(" 45.67 ", parseNumeric) == 45.67)
  }

  // ---- parse_integer (test_transformers.py:92-108)
  test("parse_integer basics and truncation toward zero") {
    assert(eval("123", parseInteger) == 123L)
    assert(eval("0", parseInteger) == 0L)
    assert(eval("123.7", parseInteger) == 123L)
    assert(eval("99.1", parseInteger) == 99L)
    assert(eval("-123.7", parseInteger) == -123L)
  }
  test("parse_integer empty -> null") {
    assert(eval("", parseInteger) == null)
    assert(eval(null, parseInteger) == null)
  }

  // ---- parse_boolean (test_transformers.py:111-134)
  test("parse_boolean true vocabulary") {
    for (s <- Seq("1", "true", "TRUE", "yes", "y", "*"))
      assert(eval(s, parseBoolean) == true, s"input '$s'")
  }
  test("parse_boolean false vocabulary") {
    for (s <- Seq("0", "false", "FALSE", "no", "n", ""))
      assert(eval(s, parseBoolean) == false, s"input '$s'")
  }
  test("parse_boolean invalid -> null") {
    assert(eval("maybe", parseBoolean) == null)
    assert(eval(null, parseBoolean) == null)
  }

  // ---- clean_code (test_transformers.py:137-158)
  test("clean_code uppercases, strips, preserves leading zeros") {
    assert(eval("a1234", cleanCode) == "A1234")
    assert(eval("j9999", cleanCode) == "J9999")
    assert(eval("  99213  ", cleanCode) == "99213")
    assert(eval("00100", cleanCode) == "00100")
    assert(eval("01999", cleanCode) == "01999")
  }
  test("clean_code empty/NULL -> null") {
    assert(eval("", cleanCode) == null)
    assert(eval("NULL", cleanCode) == null)
    assert(eval(null, cleanCode) == null)
  }
  test("clean_code 'nan' survives as 'NAN' (uppercase-before-sentinel quirk)") {
    // transformers.py:131-137 uppercases before comparing to ["nan","NaN"],
    // which therefore never match — bug-compatible.
    assert(eval("nan", cleanCode) == "NAN")
  }

  // ---- transform_value dispatch (test_transformers.py:161-186)
  test("transform_value TEXT") {
    assert(eval("hello", transformValue(_, "TEXT")) == "hello")
    assert(eval("  trimmed  ", transformValue(_, "TEXT")) == "trimmed")
    assert(eval("", transformValue(_, "TEXT")) == null)
  }
  test("transform_value TEXT preserves '*' (sentinel asymmetry)") {
    assert(eval("*", transformValue(_, "TEXT")) == "*")
    assert(eval("*", transformValue(_, "NUMERIC")) == null)
    assert(eval("*", transformValue(_, "DATE")) == null)
  }
  test("transform_value NUMERIC/INTEGER/DATE/BOOLEAN") {
    assert(eval("123.45", transformValue(_, "NUMERIC")) == 123.45)
    assert(eval("invalid", transformValue(_, "NUMERIC")) == null)
    assert(eval("123", transformValue(_, "INTEGER")) == 123L)
    assert(eval("123.7", transformValue(_, "INTEGER")) == 123L)
    assert(eval("20240101", transformValue(_, "DATE")) == d("2024-01-01"))
    assert(eval("invalid", transformValue(_, "DATE")) == null)
    assert(eval("1", transformValue(_, "BOOLEAN")) == true)
    assert(eval("0", transformValue(_, "BOOLEAN")) == false)
  }
  test("transform_value unknown type falls back to TEXT-like (keeps sentinels)") {
    assert(eval("hello", transformValue(_, "GEOMETRY")) == "hello")
    assert(eval("", transformValue(_, "GEOMETRY")) == null)
    assert(eval("NULL", transformValue(_, "GEOMETRY")) == "NULL")
  }

  // ---- parse_mai_id (test_transformers.py:191-209)
  test("parse_mai_id extracts leading digit in {1,2,3}") {
    assert(eval("1 Line Edit", parseMaiId) == 1L)
    assert(eval("2 Date of Service Edit: Policy", parseMaiId) == 2L)
    assert(eval("3 Date of Service Edit: Clinical", parseMaiId) == 3L)
  }
  test("parse_mai_id invalid -> null") {
    assert(eval("", parseMaiId) == null)
    assert(eval(null, parseMaiId) == null)
    assert(eval("4 Unknown", parseMaiId) == null)
    assert(eval("Not a number", parseMaiId) == null)
  }

  // ---- parse_mue_value (test_transformers.py:211-227)
  test("parse_mue_value zero is valid; positives parse") {
    assert(eval("0", parseMueValue) == 0L)
    assert(eval("1", parseMueValue) == 1L)
    assert(eval("10", parseMueValue) == 10L)
    assert(eval("999", parseMueValue) == 999L)
  }
  test("parse_mue_value empty -> null; float truncates") {
    assert(eval("", parseMueValue) == null)
    assert(eval(null, parseMueValue) == null)
    assert(eval("3.7", parseMueValue) == 3L)
    assert(eval("N/A", parseMueValue) == null)
  }

  // ---- parse_deletion_date (test_transformers.py:230-244)
  test("parse_deletion_date: '*' and empty mean active (null), dates parse") {
    assert(eval("*", parseDeletionDate) == null)
    assert(eval("", parseDeletionDate) == null)
    assert(eval("20240101", parseDeletionDate) == d("2024-01-01"))
  }

  // ---- parse_modifier_indicator (test_transformers.py:247-258)
  test("parse_modifier_indicator valid digits and header-contaminated cells") {
    assert(eval("0", parseModifierIndicator) == 0L)
    assert(eval("1", parseModifierIndicator) == 1L)
    assert(eval("9", parseModifierIndicator) == 9L)
    assert(eval("0=not allowed 1=allowed", parseModifierIndicator) == 0L)
    assert(eval("invalid", parseModifierIndicator) == null)
    assert(eval("3", parseModifierIndicator) == 3L) // falls back to parse_integer
  }

  // ---- parse_prior_1996_flag (test_transformers.py:261-273)
  test("parse_prior_1996_flag: '*'=true, else false, null passes through") {
    assert(eval("*", parsePrior1996Flag) == true)
    assert(eval("", parsePrior1996Flag) == false)
    assert(eval("x", parsePrior1996Flag) == false)
    assert(eval(null, parsePrior1996Flag) == null)
  }
}
