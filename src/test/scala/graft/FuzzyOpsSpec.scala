package graft

import org.apache.spark.sql.functions._

import graft.expressions.MultiPatternMatches
import graft.llm.{Blocklist, CorpusSim}
import graft.operators.EditDistanceJoin

/** Aho–Corasick blocklist, Ed-Join bounded edit distance, md5-MinHash
  * corpus overlap. */
class FuzzyOpsSpec extends SparkSpecBase {
  import org.apache.spark.sql.graftbridge.Bridge

  private def ac(text: String, patterns: Seq[String]): Seq[String] = {
    val r = eval(text, c => Bridge.column(
      MultiPatternMatches(Bridge.expression(c), patterns)))
    if (r == null) null
    else r.asInstanceOf[scala.collection.Seq[String]].toSeq
  }

  test("aho-corasick finds overlapping and nested patterns in one pass") {
    // "she" and "he" overlap; "hers" extends past "he"; suffix outputs
    // must fire through the dictionary links, not just at leaf nodes.
    val pats = Seq("he", "she", "his", "hers")
    assert(ac("ushers", pats) == Seq("he", "she", "hers"))
    assert(ac("this", pats) == Seq("his"))
    assert(ac("aaa", pats) == Seq.empty)
  }

  test("aho-corasick matches equal contains() semantics on every pattern") {
    val pats = Seq("ab", "abab", "ba", "aba", "zz")
    for (text <- Seq("abababab", "ba", "", "aabb", "zzz", "abz")) {
      val expected = pats.filter(text.contains(_))
      assert(ac(text, pats) == expected, s"text=$text")
    }
  }

  test("aho-corasick is declaration-ordered, null-safe, and repeat-deduped") {
    val pats = Seq("zz", "a")
    assert(ac("aaazzaa", pats) == Seq("zz", "a")) // order = declaration, once each
    assert(ac(null, pats) == null)
  }

  test("blocklist report keeps zero-hit patterns with count 0") {
    import spark.implicits._
    val docs = Seq((1L, "big table scan"), (2L, "slow query here"),
      (3L, "nothing to see")).toDF("doc_id", "text")
    val r = Blocklist.report(docs, "text", Seq("big table", "slow query", "gpu"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r == Map("big table" -> 1L, "slow query" -> 1L, "gpu" -> 0L))
  }

  test("ed-join finds exactly the brute-force distance-1 pairs") {
    import spark.implicits._
    val names = Seq("widget-0001", "widget-0002", "widget-0011", "gadget-0001",
      "widget-00012", "sprocket-9", "sprocket-8", "completely different")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = EditDistanceJoin.selfJoin(df, "id", "s", maxDist = 1)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      i <- names.indices; j <- names.indices if i < j
      if levenshteinRef(names(i), names(j)) <= 1
    } yield (i.toLong, j.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
    assert(brute.contains((0L, 1L)) && brute.contains((5L, 6L))) // non-trivial
  }

  test("ed-join never drops a pair (distance 2, short strings)") {
    import spark.implicits._
    val names = Seq("abcdef", "abcxef", "abcxyf", "ab", "ax", "xy", "abcdefgh")
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val got = EditDistanceJoin.selfJoin(df, "id", "s", maxDist = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      i <- names.indices; j <- names.indices if i < j
      if levenshteinRef(names(i), names(j)) <= 2
    } yield (i.toLong, j.toLong)).toSet
    assert(got == brute, s"got $got want $brute")
  }

  test("minhash overlap: disjoint sources near 0, identical sources at 1") {
    import spark.implicits._
    val docs = (
      (0 until 30).map(i => (s"a", s"alpha$i beta$i gamma$i delta$i eps$i")) ++
      (0 until 30).map(i => (s"b", s"alpha$i beta$i gamma$i delta$i eps$i")) ++
      (0 until 30).map(i => (s"c", s"zeta$i eta$i theta$i iota$i kappa$i"))
    ).toDF("source", "text")
    val m = CorpusSim.overlapMatrix(docs, "source", "text", n = 3, numPerms = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m(("a", "b")) == 64L)      // identical vocabularies agree everywhere
    assert(m(("a", "c")) <= 3L)       // disjoint: only hash collisions
    // Deterministic: a second run produces the same signatures.
    val again = CorpusSim.overlapMatrix(docs, "source", "text", n = 3, numPerms = 64)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m == again)
  }

  test("ed-join equals brute force on dense adversarial random strings") {
    import spark.implicits._
    // Small alphabet + short lengths = maximal gram collisions and many
    // true pairs at k=2: the regime where an unsound prefix/position
    // bound actually drops pairs.
    val rnd = new scala.util.Random(42)
    val names = Seq.fill(80)(
      (3 + rnd.nextInt(10) to 0 by -1).map(_ => "abc"(rnd.nextInt(3))).mkString)
    val df = names.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = EditDistanceJoin.selfJoin(df, "id", "s", maxDist = k)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = (for {
        i <- names.indices; j <- names.indices if i < j
        if levenshteinRef(names(i), names(j)) <= k
      } yield (i.toLong, j.toLong)).toSet
      assert(brute.nonEmpty && got == brute,
        s"k=$k: missing=${brute.diff(got).take(5)} extra=${got.diff(brute).take(5)}")
    }
  }

  test("minhash signatures obey the merge law: sig(A ∪ B) = min(sig(A), sig(B))") {
    import spark.implicits._
    val a = (0 until 20).map(i => ("x", s"left$i mid$i right$i tail$i")).toDF("source", "text")
    val b = (0 until 20).map(i => ("x", s"other$i words$i here$i now$i")).toDF("source", "text")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      CorpusSim.signatures(df, "source", "text", n = 3, numPerms = 64)
        .head.getSeq[Long](1)
    val merged = sig(a).zip(sig(b)).map { case (x, y) => math.min(x, y) }
    assert(merged == sig(a.unionByName(b)))
  }

  test("novelty: shared docs score 0, unique docs score 1, mixed in between") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"),       // identical → 0 novelty
      (3L, "p q r s t u"),                            // unique → 1
      (4L, "a b c d e z")                             // shares gram "a b c d e"
    ).toDF("doc_id", "text")
    val m = CorpusSim.noveltyScores(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(m(1L) == 0.0 && m(2L) == 0.0 && m(3L) == 1.0)
    assert(m(4L) == 0.5) // grams "a b c d e" (df=3) and "b c d e z" (df=1)
  }

  /** Textbook DP Levenshtein as the spec's independent reference. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
