package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.JaroWinkler

/** Exact-integer Jaro–Winkler: textbook vectors (the Winkler 1990 paper
  * examples), boost-threshold behavior, and edge cases. */
class JaroWinklerSpec extends SparkSpecBase {

  private def s4(a: String, b: String): Long =
    JaroWinkler.sim4(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook vectors match the standard definition (and DuckDB)") {
    // jaro(martha, marhta) = 0.9444…, prefix 3 → 0.9611…
    assert(s4("martha", "marhta") == 9611L)
    // jaro(dwayne, duane) = 0.8222…, prefix 1 → 0.84
    assert(s4("dwayne", "duane") == 8400L)
    // jaro(dixon, dicksonx) = 0.7667…, prefix 2 → 0.8133…
    assert(s4("dixon", "dicksonx") == 8133L)
  }

  test("boost applies only above the 0.7 jaro threshold") {
    // jaro(aXXXX, aYYYY) = 0.4667 with prefix 1: no boost below 0.7.
    assert(s4("aXXXX", "aYYYY") == 4667L)
  }

  test("prefix caps at 4") {
    // jaro = (7/8 + 7/8 + 1)/3 = 0.9167; prefix 7 counts as 4 → 0.95.
    assert(s4("abcdefgh", "abcdefgX") == 9500L)
  }

  test("edges: equal, empty, and no-match-window strings") {
    assert(s4("abc", "abc") == 10000L)
    assert(s4("a", "a") == 10000L)
    assert(s4("", "abc") == 0L)
    assert(s4("", "") == 0L) // DuckDB's empty-empty convention
    assert(s4("ab", "ba") == 0L) // window 0: no matches
  }

  test("long inputs (> LongSafeLen) take the BigInt path without overflow") {
    // 24k-char strings: num·20000 would overflow a Long (~1.2e6·L³). The
    // pair is one 12-char block repeated, with a single trailing edit —
    // verify against an all-BigInt replay of the same m/k/prefix counts.
    val block = "abcdefghijkl"
    val a = block * 2000
    val b = block * 2000 + "zz"
    val got = s4(a, b)
    assert(got > 9990L && got <= 10000L, s"long-input score off: $got")
    // All-BigInt replay: every a-char matches in order (same prefix
    // alignment), so m = |a|, k = 0, prefix = 4.
    val (la, lb, m, k, prefix) =
      (BigInt(a.length), BigInt(b.length), BigInt(a.length), BigInt(0), 4)
    val n = 2 * m * m * (la + lb) + (2 * m - k) * la * lb
    val d = 6 * m * la * lb
    val (num, den) =
      if (10 * n > 7 * d) (BigInt(10 - prefix) * n + prefix * d, 10 * d)
      else (n, d)
    assert(got == ((num * 20000 + den) / (2 * den)).toLong)
  }

  test("symmetry") {
    for ((a, b) <- Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("aaapppp", "appp")))
      assert(s4(a, b) == s4(b, a))
  }

  test("half-transposition case agrees with DuckDB") {
    // jaro(aaapppp, appp) = 0.8571…, prefix 1 → 0.8714… (DuckDB: same)
    assert(s4("aaapppp", "appp") == 8714L)
  }
}
