package graft

import java.nio.file.Files

import graft.llm.NgramLm

/** Round-14 wave-27 pins: Kneser–Ney-lite scoring — an independent
  * Scala replay of the full formula on a hand corpus, and the
  * continuation-vs-frequency property that separates KN from add-one. */
class KnLmSpec extends SparkSpecBase {

  private def docsDir(texts: Seq[String]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-kn").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def replay(texts: Seq[String]): Map[Long, (Long, Double)] = {
    def grams(t: String): Seq[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size < 2) Seq(toks.mkString(" "))
      else toks.sliding(2).map(_.mkString(" ")).toSeq
    }
    val allGrams = texts.flatMap(grams)
    val c2 = allGrams.groupBy(identity).map { case (k, v) => k -> v.size }
    val toks = texts.flatMap(_.trim.split("\\s+"))
    val c1 = toks.groupBy(identity).map { case (k, v) => k -> v.size }
    val v = c1.size
    val types = c2.keys.toSeq
    val nf = types.map(_.split(" ")(0)).groupBy(identity)
      .map { case (k, xs) => k -> xs.size }
    val nb = types.filter(_.split(" ").length >= 2).map(_.split(" ")(1))
      .groupBy(identity).map { case (k, xs) => k -> xs.size }
    val bv = types.size.toDouble + v.toDouble
    texts.zipWithIndex.map { case (t, i) =>
      val lps = grams(t).map { g =>
        val w1 = g.split(" ")(0)
        val w2 = g.split(" ").lift(1)
        val pc = (w2.flatMap(nb.get).getOrElse(0) + 1.0) / bv
        val p = nf.get(w1) match {
          case Some(f) =>
            math.max(c2.getOrElse(g, 0).toDouble - 0.5, 0.0) / c1(w1) +
              (0.5 * f / c1(w1)) * pc
          case None => pc
        }
        math.floor(math.log(p) * 1e8 + 0.5) / 1e8
      }
      val sum = lps.map(BigDecimal(_)).sum // exact decimal sum, as shipped
      i.toLong -> ((lps.size.toLong,
        math.floor(sum.toDouble / lps.size * 1e6 + 0.5) / 1e6))
    }.toMap
  }

  test("scores match an independent Scala replay on a hand corpus") {
    val texts = Seq(
      "the cat sat on the mat",
      "the dog sat on the rug",
      "cat dog cat dog cat",
      "singleton",
      "zebra ends the") // 'the' never ends elsewhere; 'zebra' unseen context
    val got = SparkEntry.queries("q_llm_lm_kn")(spark, docsDir(texts))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val exp = replay(texts)
    exp.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n, s"n_bigrams($id)")
      assert(got(id)._2 == s, s"kn_logp($id): got ${got(id)._2}, want $s")
    }
  }

  test("continuation beats raw frequency: KN ranks the versatile completer higher") {
    // 'b' follows many distinct contexts; 'z' is frequent but only ever
    // follows 'q'. For a NOVEL context ('n b' vs 'n z', both unseen
    // bigrams with seen context n), KN must prefer b — add-one would
    // score them by raw frequency and get z wrong.
    val train = Seq("a b", "c b", "d b", "e b",
      "q z", "q z", "q z", "q z", "q z", "q z",
      "n m")
    val probe = Seq("n b", "n z")
    val dir = docsDir(train ++ probe)
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = NgramLm.fit(docs, "text")
    val kn = NgramLm.scoreKneserNey(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val addOne = NgramLm.scoreAvgLogProb(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val (nbId, nzId) = (train.size.toLong, train.size.toLong + 1)
    assert(kn(nbId) > kn(nzId),
      "KN: the many-context completer wins the novel context")
    assert(addOne(nbId) == addOne(nzId),
      "add-one is blind here by construction: (c2+1)/(c1+V) never reads " +
        "the completer, so it CANNOT rank these — the signal is KN-only")
    model.release()
  }
}
