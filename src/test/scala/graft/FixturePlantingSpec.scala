package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical gate for the planted-id collision class (judge directive
  * r16 item 7): fixture builders that synthesize twin/decoy rows MUST
  * mint their ids in the NEGATIVE namespace (e.g. `-(doc_id + 1)`,
  * `-(20001 + r)`), never by adding a positive offset — `doc_id + 10000`
  * collides with REAL ids the moment the corpus outgrows the offset,
  * which is exactly how `q_mm_audio_fp` diverged at sf1 in round 15 (the
  * oracle's GROUP BY merged a planted twin with an unrelated real clip
  * while the engine kept both behind a nondeterministic window tie). The
  * class recurred twice (r13 waveform structure, r15 audio-fp), so the
  * lesson is enforced here instead of remembered in PLANS.md.
  *
  * The lint scans every non-test Scala source (engine code AND the
  * embedded DuckDB oracle SQL, which live in the same files) for
  * positive-offset planting on id-like columns. Legitimate id arithmetic
  * stays legal: `doc_id + 1` adjacency joins (offset < 100), RRF's
  * `rank + 60`, modulo bucketing, and non-id scaling like
  * `c_acctbal * 100 + 100000` (not an `_id` column). */
class FixturePlantingSpec extends AnyFunSuite {

  /** An id-ish column (`…_id`, optionally wrapped as `col("…_id")`)
    * followed by `+ <literal ≥ 100>` — the planting shape. */
  private val idPlusOffset = """\w*_id"?\)?\s*\+\s*\d{3,}""".r

  /** The SQL mega-group shape: a large literal base plus a range/series
    * variable (`SELECT 20000 + t.r`). The lookbehind admits the negated
    * namespace form `-(20001 + t.r)`. */
  private val basePlusRange = """(?<!-\()\b\d{4,}\s*\+\s*t\.r\b""".r

  private def sources: Seq[Path] = {
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(Files.isDirectory(root),
      s"expected to run from the repo root; missing $root")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq.sortBy(_.toString)
  }

  test("no positive-offset planted ids anywhere in src/main") {
    val hits = for {
      p <- sources
      (line, i) <- Files.readString(p).linesIterator.zipWithIndex.toSeq
      m <- idPlusOffset.findFirstIn(line).toSeq ++
        basePlusRange.findFirstIn(line).toSeq
    } yield s"$p:${i + 1}: '$m' in: ${line.trim.take(80)}"
    assert(hits.isEmpty,
      "positive-offset id planting collides with real ids once the " +
        "corpus outgrows the offset - mint planted ids in the negative " +
        "namespace (-(id + 1)) instead:\n" + hits.mkString("\n"))
  }

  test("the lint actually catches the r15 collision shapes " +
      "(positive controls)") {
    // Each of these is a shape that shipped (and later diverged or was
    // migrated) - a re-introduced twin in any of these spellings fails
    // the scan above.
    val reintroduced = Seq(
      """.withColumn("doc_id", col("doc_id") + 10000)""",
      """SELECT doc_id + 10000, text FROM documents WHERE doc_id < 50""",
      """planted AS (SELECT doc_id AS id_a, doc_id + 10000 AS id_b""",
      """.withColumn("vec_id", col("vec_id") + 10000)""",
      """.select((col("doc_id") + 5000).as("doc_id"),""",
      """SELECT 20000 + t.r, embedding""")
    reintroduced.foreach { bad =>
      assert(idPlusOffset.findFirstIn(bad).nonEmpty ||
        basePlusRange.findFirstIn(bad).nonEmpty,
        s"lint failed to catch: $bad")
    }
    // ...while the legitimate arithmetic idioms stay legal.
    val legal = Seq(
      """.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))""",
      """FROM g a JOIN g b ON a.doc_id + 1 = b.doc_id ORDER BY doc_a""",
      """(ORDER BY score DESC, doc_id) + 60) AS c""",
      """expr("(floor(c_acctbal * 100 + 0.5) + 100000) div 200000")""",
      """SELECT -(doc_id + 1), text FROM documents WHERE doc_id < 50""",
      """.select((-(lit(20001L) + col("_r"))).as("vec_id"),""",
      """SELECT -(20001 + t.r) AS id,""")
    legal.foreach { ok =>
      assert(idPlusOffset.findFirstIn(ok).isEmpty &&
        basePlusRange.findFirstIn(ok).isEmpty,
        s"lint over-matches legitimate arithmetic: $ok")
    }
  }
}
