package graft

import org.apache.spark.sql.functions._

import graft.llm.{FeatureHash, Winnow}

/** Winnowing fingerprints (MOSS guarantees) + hashing-trick features. */
class WinnowSpec extends SparkSpecBase {

  test("shared substrings of w+k-1 words share at least one fingerprint") {
    import spark.implicits._
    val common = "alpha beta gamma delta epsilon zeta"   // 6 = w+k-1 words
    val docs = Seq(
      (1L, s"one two three $common four five six seven"),
      (2L, s"nine ten $common eleven twelve thirteen fourteen"))
      .toDF("id", "text")
    val fps = Winnow.fingerprints(docs, "id", "text", k = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty,
      "winnowing guarantee: shared window must share a fingerprint")
  }

  test("density lands near 2/(w+1) and selection is position-stable") {
    import spark.implicits._
    val words = (0 until 400).map(i => s"w${(i * 7919) % 1000}").mkString(" ")
    val docs = Seq((1L, words)).toDF("id", "text")
    val n = Winnow.fingerprints(docs, "id", "text", k = 3, w = 4).count()
    val grams = 400 - 2
    // expected density 2/(w+1) = 0.4; allow a wide band
    assert(n > grams * 0.2 && n < grams * 0.6, s"density off: $n of $grams")
    // A prefix edit shifts positions but downstream fingerprints stay
    // selected at shifted positions with the same hashes.
    val shifted = Seq((1L, "zz " + words)).toDF("id", "text")
    val a = Winnow.fingerprints(docs, "id", "text", k = 3, w = 4)
      .select("fp").collect().map(_.getLong(0)).toSet
    val b = Winnow.fingerprints(shifted, "id", "text", k = 3, w = 4)
      .select("fp").collect().map(_.getLong(0)).toSet
    assert((a & b).size > a.size / 2, "local edit must not churn the sketch")
  }

  test("long documents (> 4096 grams) fingerprint exactly — no pos underflow") {
    import spark.implicits._
    // 5000 words -> 4998 word-3-grams: under the old 12-bit PosCap=4096
    // packing, every gram past pos 4095 underflowed into the previous
    // hash's range (silently wrong fp AND pos). Replay the selection
    // driver-side and require exact (pos, fp) equality end to end.
    val nWords = 5000
    val words = (0 until nWords).map(i => s"w${(i * 104729) % 1500}")
    val docs = Seq((1L, words.mkString(" "))).toDF("id", "text")
    val got = Winnow.fingerprints(docs, "id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet

    def h28(g: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(7), 16)
    }
    val grams = words.sliding(3).map(_.mkString(" ")).toIndexedSeq
    assert(grams.size > 4096, "test must exceed the old 12-bit cap")
    val packed = grams.zipWithIndex.map { case (g, p) =>
      h28(g) * Winnow.PosCap + (Winnow.PosCap - 1 - p)
    }
    val want = (3 until grams.size).map { p =>
      val sel = packed.slice(p - 3, p + 1).min
      (Winnow.PosCap - 1 - (sel % Winnow.PosCap), sel / Winnow.PosCap)
    }.toSet
    assert(got == want, "fingerprints must match the exact driver replay")
    // every decoded position must be a real gram position
    assert(got.forall { case (p, _) => p >= 0 && p < grams.size })
  }

  test("overlap pairs: plagiarized pair found; boilerplate fps capped out") {
    import spark.implicits._
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")   // real overlap
    val boiler = "the quick brown fox jumps again and again today" // in ALL docs
    val docs = Seq(
      (1L, s"$boiler alpha beta $shared gamma delta"),
      (2L, s"$boiler nine ten $shared eleven twelve"),
      (3L, s"$boiler unrelated words entirely different content here"),
      (4L, s"$boiler other totally distinct tokens everywhere now"))
      .toDF("id", "text")
    val pairs = Winnow.overlapPairs(docs, "id", "text", k = 3, w = 4,
        maxDf = 2, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "plagiarized pair must surface")
    // the boilerplate prefix is in all 4 docs -> df=4 > maxDf=2, so it
    // cannot create pairs among the unrelated docs
    assert(!pairs.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"boilerplate fingerprints leaked pairs: $pairs")
  }

  test("overlap spans locate the shared material on both sides") {
    import spark.implicits._
    val shared = (0 until 20).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),       // shared at words 2..21
      (2L, s"p q r s t u v w x y $shared tail end")) // shared at words 10..29
      .toDF("id", "text")
    val spans = Winnow.overlapSpans(docs, "id", "text", k = 3, w = 4,
        maxDf = 10, minShared = 3)
      .collect()
    assert(spans.length == 1)
    val r = spans.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    val (aLo, aHi, bLo, bHi) =
      (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
    // Doc 2's copy sits 8 words later than doc 1's: every shared
    // fingerprint position must shift by exactly that offset band.
    assert(aLo >= 2 && aHi <= 21, s"span a [$aLo,$aHi]")
    assert(bLo >= 10 && bHi <= 29, s"span b [$bLo,$bHi]")
    assert(bLo - aLo == 8 && bHi - aHi == 8,
      s"copy offset must be 8: a=[$aLo,$aHi] b=[$bLo,$bHi]")
  }

  test("hashed features: signed counts match a driver-side replay") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "x y")).toDF("id", "text")
    val got = FeatureHash.features(docs, "id", "text", n = 2, k = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def gramsOf(t: String) = t.split(" ").sliding(2).map(_.mkString(" ")).toSeq
    def replay(t: String): Seq[Long] = {
      val f = Array.fill(16)(0L)
      gramsOf(t).foreach { g =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
        val idx = (java.lang.Long.parseLong(md.take(13), 16) % 16).toInt
        val s = if (java.lang.Long.parseLong(md.substring(13, 14), 16) % 2 == 0)
          1L else -1L
        f(idx) += s
      }
      f.toSeq
    }
    assert(got(1L) == replay("a b a b c"))
    assert(got(2L) == replay("x y"))
    // feature vectors are fixed-width regardless of text length
    assert(got.values.forall(_.size == 16))
  }
}
