package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Wave-23 pins: Croston intermittent-demand fold (hand-traced α=1/5
  * truncating updates incl. a negative step) and tokenizer fertility
  * ratios on a constructed bilingual corpus. */
class CrostonFertilitySpec extends SparkSpecBase {

  test("croston: hand-traced size/interval smoothing with a negative step") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-croston").toString
    val dayMs = 86400000L
    // Brand B1 demand points (day, qty): (0,10), (5,20), (6,1).
    //   init z=10, p=1, pd=0
    //   e=(5,20): z = 10 + (20-10) div 5 = 12; p = 1 + (5-1) div 5 = 1
    //     (trunc(4/5)=0); pd=5
    //   e=(6,1):  z = 12 + trunc((1-12)/5) = 12 - 2 = 10;
    //             p = 1 + trunc((1-1)/5) = 1
    //   forecast4 = 10*1e4/1 = 100000.
    // Brand B2: single point (3,7) → z=7, p=1, f4=70000.
    val li = Seq((1L, 0L, 10.0), (1L, 5L, 20.0), (1L, 6L, 1.0),
      (2L, 3L, 7.0))
    li.zipWithIndex.map { case ((pk, d, q), i) =>
      (i.toLong, pk, new Timestamp(d * dayMs), q)
    }.toDF("l_orderkey", "l_partkey", "l_shipdate", "l_quantity")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    Seq((1L, "B1"), (2L, "B2")).toDF("p_partkey", "p_brand")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q_ts_croston")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("B1") == (3L, 10L, 1L, 100000L))
    assert(got("B2") == (1L, 7L, 1L, 70000L))
  }

  test("fertility: bilingual corpus yields exact per-language ratios") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-fert").toString
    // 'en': 2 docs, 3+2 tokens, declared 30+20 chars → cpt4 = 100000,
    // tpd = 2. 'de': 1 doc, 2 tokens, 25 chars → cpt4 = 125000, tpd 2.
    val docs = Seq(
      (1L, "one two three", "en", 30L),
      (2L, "four five", "en", 20L),
      (3L, "zwei worte", "de", 25L))
    docs.toDF("doc_id", "text", "lang", "n_chars")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_llm_fertility")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("en") == (2L, 5L, 50L, 100000L, 2L))
    assert(got("de") == (1L, 2L, 25L, 125000L, 2L))
  }
}
