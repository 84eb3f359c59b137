package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Round-14 wave-20 pins: subject-access export (hand footprint incl.
  * an order-less subject) and code-vs-prose detection (hand documents
  * on both sides of the density gate). */
class SubjectCodeSpec extends SparkSpecBase {

  test("subject export: hand footprints, order-less subject sentinels") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dsar").toString
    Seq((997L, "BUILDING", 0L, 1.0), (1994L, "MACHINERY", 0L, 2.0),
        (42L, "AUTOMOBILE", 0L, 3.0)) // 42 is not a subject
      .toDF("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 997L, "O", Timestamp.valueOf("1995-03-15 00:00:00"), 1.0),
        (11L, 997L, "F", Timestamp.valueOf("1995-06-15 00:00:00"), 1.0),
        (12L, 42L, "O", Timestamp.valueOf("1995-01-15 00:00:00"), 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L, 10.5), (10L, 2L, 20.25), (11L, 1L, 5.0),
        (12L, 1L, 99.0))
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_gov_subject_export")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    val mar95 = 1995L * 12 + 3
    assert(got.keySet == Set(997L, 1994L), "only subjects exported")
    assert(got(997L) == (("BUILDING", 2L, 1L, 3L, 3575L, mar95, mar95 + 3)))
    assert(got(1994L) == (("MACHINERY", 0L, 0L, 0L, 0L, -1L, -1L)))
  }

  test("code detect: hand documents on both sides of the density gate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-code").toString
    val codeDoc = "def f(x):\n    return g(x);\n    var y = {a};\n"
    val proseDoc = "The quick brown fox jumps over the lazy dog again " * 4
    Seq((1L, codeDoc), (2L, proseDoc))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // codeDoc signals: punct [{}();] = ( ) : -> chars {}();(); count:
    // '(' ')' ';' '{' '}' ';' '(' ')' -> worked below via independent count.
    def sig(t: String): Long = {
      val punct = t.count("{}();".contains(_)).toLong
      val indent = ("\n    ".r.findAllIn(t).length
        + "\n\t".r.findAllIn(t).length).toLong
      val kw = """\b(def|class|return|import|function|var|const)\b""".r
        .findAllIn(t).length.toLong
      punct + 2 * indent + 3 * kw
    }
    val expected = Seq((1L, codeDoc), (2L, proseDoc)).map { case (_, t) =>
      (if (sig(t) * 200 > t.length) "code" else "text", sig(t), t.length.toLong)
    }
    assert(expected.map(_._1).toSet == Set("code", "text"),
      "fixture must exercise both labels")
    val got = SparkEntry.queries("q_llm_code_detect")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    expected.groupBy(_._1).foreach { case (label, rows) =>
      val ss = rows.map(_._2).sum; val sc = rows.map(_._3).sum
      assert(got(label) == ((rows.size.toLong, ss, sc, ss * 10000 / sc)),
        s"label $label")
    }
  }
}
