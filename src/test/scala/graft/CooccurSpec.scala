package graft

import graft.llm.Cooccur

/** Hand-derived PMI fixtures for the co-occurrence operator. */
class CooccurSpec extends SparkSpecBase {

  test("pmi: hand-computed counts and values on a 4-token doc") {
    import spark.implicits._
    // tokens a b a b; span 2 ⇒ pairs d=1: (a,b),(b,a),(a,b); d=2: (a,a),(b,b)
    // N_pairs = 5, N_tok = 4, n_a = n_b = 2.
    val df = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val out = Cooccur.pmi(df, "doc_id", "text", span = 2, minCount = 1L)
      .orderBy("tok_a", "tok_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // pmi(a,b) = ln(2·4·4 / (5·2·2)) = ln(1.6) → 0.47 at floored 4dp
    // pmi(b,a) = pmi(a,a) = pmi(b,b) = ln(1·4·4 / (5·2·2)) = ln(0.8) → -0.2231
    assert(out.toSeq == Seq(
      ("a", "a", 1L, -0.2231),
      ("a", "b", 2L, 0.47),
      ("b", "a", 1L, -0.2231),
      ("b", "b", 1L, -0.2231)))
  }

  test("pmi: minCount prunes, short docs emit only in-bounds windows") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, ""), (3L, "y z")).toDF("doc_id", "text")
    val out = Cooccur.pmi(df, "doc_id", "text", span = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // Single pair (y,z); the 1-token and empty docs contribute none.
    assert(out.toSeq == Seq(("y", "z", 1L)))
    assert(Cooccur.pmi(df, "doc_id", "text", span = 2, minCount = 2L).count() == 0)
  }

  test("dunningG2: hand-computed 2×2 cells on an 8-token doc") {
    import spark.implicits._
    // tokens a b a b a b c d → bigrams ab ba ab ba ab bc cd, N = 7;
    // left marginals a:3 b:3 c:1; right marginals b:3 a:2 c:1 d:1.
    // e.g. (a,b): k11=3 k12=0 k21=0 k22=4 →
    //   G² = 2·(3·ln(21/9) + 4·ln(28/16)) = 9.5607 at floored 4dp.
    val df = Seq((1L, "a b a b a b c d")).toDF("doc_id", "text")
    val out = Cooccur.dunningG2(df, "text", minCount = 1L)
      .orderBy("tok_a", "tok_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      ("a", "b", 3L, 3L, 3L, 9.5607),
      ("b", "a", 2L, 3L, 2L, 4.5567),
      ("b", "c", 1L, 3L, 1L, 1.9225),
      ("c", "d", 1L, 1L, 1L, 5.7416)))
  }

  test("dunningG2: minCount prunes and sub-2-token docs contribute nothing") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, ""), (3L, "y z"), (4L, "y z"))
      .toDF("doc_id", "text")
    val out = Cooccur.dunningG2(df, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // (y,z) twice is the whole bigram population → every cell off-diagonal
    // is 0 and G² degenerates to 0 (2·2·ln(2·2/(2·2)) = 0).
    assert(out.toSeq == Seq(("y", "z", 2L)))
    assert(Cooccur.dunningG2(df, "text", minCount = 3L).count() == 0)
  }
}
