package graft

import org.apache.spark.sql.functions._

import graft.llm.{BinaryQuant, Similarity}

/** Binary sign quantization: packed codes match the driver-side twin,
  * Hamming == sign-mismatch count, and the shortlist+re-rank recovers
  * the brute-force top-k when Hamming structure is informative. */
class BinaryQuantSpec extends SparkSpecBase {

  test("signCode agrees with the pure-Scala twin, all 64 bits") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)),
      (2L, Array.tabulate(64)(i => if (i == 63) 0.5f else -0.5f)),
      (3L, Array.fill(64)(0.0f)),              // x > 0 strictly: all bits 0
      (4L, Array.tabulate(64)(i => (i - 32).toFloat)))
    val df = vecs.toDF("id", "e")
    val got = df.select(col("id"), BinaryQuant.signCode(col("e"), 64).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == BinaryQuant.signCodeOf(v.map(_.toDouble).toSeq),
        s"vec $id")
    }
    assert(got(3L) == 0L)
    assert((got(2L) >>> 63) == 1L, "bit 63 must pack (sign-bit territory)")
  }

  test("bit_count(xor) equals the sign-mismatch count") {
    import spark.implicits._
    val a = Array.tabulate(64)(i => if (i < 40) 1.0f else -1.0f)
    val b = Array.tabulate(64)(i => if (i < 25 || i >= 50) 1.0f else -1.0f)
    val mismatches = (0 until 64).count(i => (a(i) > 0) != (b(i) > 0))
    val df = Seq((a, b)).toDF("a", "b")
    val ham = df.select(
      bit_count(BinaryQuant.signCode(col("a"), 64)
        .bitwiseXOR(BinaryQuant.signCode(col("b"), 64))).cast("long"))
      .head.getLong(0)
    assert(ham == mismatches)
  }

  test("shortlist + exact re-rank recovers brute-force top-k") {
    import spark.implicits._
    // Corpus of sign-structured vectors: magnitude noise varies but the
    // orthant (sign pattern) encodes the cluster — the regime binary
    // quantization is designed for.
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 500L).map { id =>
      val signs = Array.tabulate(64)(i =>
        if (((id / 50) >> (i % 8)) % 2 == 0) 1.0f else -1.0f)
      (id, signs.map(s => s * (0.5f + rnd.nextFloat())))
    }
    val df = corpus.toDF("vec_id", "embedding")
    val query = corpus.head._2.map(_.toDouble).toSeq
    val got = BinaryQuant.searchTopK(df, "embedding", "vec_id", query,
        k = 10, shortlist = 60)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val want = Similarity.bruteForceTopK(df, "embedding", "vec_id", query, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == want, s"binary shortlist missed true neighbors: $got vs $want")
  }
}
