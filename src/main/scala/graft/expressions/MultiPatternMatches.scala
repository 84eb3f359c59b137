package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct blocklist patterns occurring as substrings of the input, in
  * pattern-declaration order — matched with one Aho–Corasick pass
  * (Aho & Corasick 1975, CACM 18(6)) instead of `patterns.length`
  * separate `contains` scans.
  *
  * This is the scale-correct formulation of blocklist filtering: a
  * curation blocklist is thousands of phrases, and the naive
  * `OR contains(text, p)` plan re-reads every document once per phrase —
  * O(|text|·|patterns|) over a 100 TB corpus. The automaton is built once
  * on the driver, rides along as a reference object (serialized to each
  * executor once, like a broadcast), and matches every pattern
  * simultaneously in a single O(|text|) sweep with early exit once all
  * patterns have been seen. The DuckDB oracle mirrors the per-pattern
  * `contains` form — same answer, the plan this expression exists to
  * avoid.
  *
  * Matching is case-sensitive over UTF-16 code units (patterns and text
  * are word-phrases here; surrogate pairs never split a match because a
  * match is always a contiguous code-unit run of the pattern itself).
  * Null text → null. */
case class MultiPatternMatches(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "multi_pattern_matches needs at least one pattern")
  require(patterns.forall(_.nonEmpty), "empty pattern matches everywhere — refuse it")
  require(patterns.distinct.size == patterns.size,
    "duplicate patterns would double-report; dedupe at the call site")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"multi_pattern_matches requires string, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "multi_pattern_matches"

  /** Aho–Corasick automaton: goto trie + BFS failure links, with each
    * node's dictionary output pre-merged into a flat pattern-index array
    * so the match loop never walks suffix links. Built lazily per JVM
    * (the case class serializes only `patterns`). */
  @transient private lazy val automaton: Automaton = Automaton.build(patterns)

  @transient private lazy val patternStrings: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  def compute(input: UTF8String): GenericArrayData = {
    val text = input.toString
    val found = new java.util.BitSet(patterns.length)
    var nFound = 0
    var state = 0
    var i = 0
    val n = text.length
    while (i < n && nFound < patterns.length) {
      state = automaton.step(state, text.charAt(i))
      val out = automaton.outputs(state)
      var j = 0
      while (j < out.length) {
        if (!found.get(out(j))) { found.set(out(j)); nFound += 1 }
        j += 1
      }
      i += 1
    }
    val hits = new Array[AnyRef](nFound)
    var p = found.nextSetBit(0)
    var k = 0
    while (p >= 0) {
      hits(k) = patternStrings(p)
      k += 1
      p = found.nextSetBit(p + 1)
    }
    new GenericArrayData(hits)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("multiPatternMatches", this)
      s"${ev.value} = $ref.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiPatternMatches =
    copy(child = newChild)
}

/** Goto/fail/output tables for [[MultiPatternMatches]]. Transitions are
  * per-node hash maps (blocklists are sparse over the alphabet); misses
  * resolve through failure links once at match time, memoized nothing —
  * the automaton is O(total pattern length) to build and O(1) amortized
  * per input char to run. */
private[expressions] final class Automaton(
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    val outputs: Array[Array[Int]]) extends Serializable {

  def step(state: Int, c: Char): Int = {
    var s = state
    var next = gotoMaps(s).get(c)
    while (next == null && s != 0) {
      s = fail(s)
      next = gotoMaps(s).get(c)
    }
    if (next == null) 0 else next.intValue()
  }
}

private[expressions] object Automaton {
  def build(patterns: Seq[String]): Automaton = {
    val gotoMaps = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (pat, idx) =>
      var s = 0
      pat.foreach { c =>
        val next = gotoMaps(s).get(c)
        if (next == null) {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ends += Nil
          gotoMaps(s).put(c, gotoMaps.size - 1)
          s = gotoMaps.size - 1
        } else s = next.intValue()
      }
      ends(s) = idx :: ends(s)
    }
    val n = gotoMaps.size
    val fail = new Array[Int](n)
    val outputs = new Array[Array[Int]](n)
    outputs(0) = ends(0).reverse.toArray
    val queue = new java.util.ArrayDeque[Integer]()
    gotoMaps(0).forEach { (_, child) =>
      fail(child) = 0
      queue.add(child)
    }
    while (!queue.isEmpty) {
      val s = queue.poll().intValue()
      // Dictionary outputs of the fail target are already merged (BFS
      // order guarantees fail(s) was finished first), so each node's
      // output list is complete and the match loop never chases links.
      outputs(s) = (ends(s).reverse ++ outputs(fail(s))).toArray
      gotoMaps(s).forEach { (c, child) =>
        var f = fail(s)
        var next = gotoMaps(f).get(c)
        while (next == null && f != 0) {
          f = fail(f)
          next = gotoMaps(f).get(c)
        }
        fail(child) = if (next == null || next.intValue() == child.intValue()) 0
                      else next.intValue()
        queue.add(child)
      }
    }
    new Automaton(gotoMaps.toArray, fail, outputs)
  }
}
