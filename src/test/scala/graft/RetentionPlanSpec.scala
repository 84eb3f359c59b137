package graft

import java.nio.file.Files
import java.sql.Timestamp

/** Round-14 wave-18 pins: version retention plan — a hand version
  * history where the keep-3 cut, the reclaim mass, and the kept window
  * are all worked out, plus the fewer-than-keep degenerate. */
class RetentionPlanSpec extends SparkSpecBase {

  test("keep-3 policy: hand history with worked reclaim mass") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ret").toString
    // part 0 (custkey 5): five monthly versions Jan..May 1995, $10/mo
    // per order, 2 orders in each of the two oldest months.
    // part 1 (custkey 1): two versions only -> nothing expires.
    val rows =
      Seq("1995-01", "1995-01", "1995-02", "1995-02", "1995-03",
          "1995-04", "1995-05").zipWithIndex.map { case (m, i) =>
        (100L + i, 5L, Timestamp.valueOf(s"$m-15 00:00:00"), 10.0)
      } ++ Seq(
        (200L, 1L, Timestamp.valueOf("1995-01-15 00:00:00"), 7.0),
        (201L, 1L, Timestamp.valueOf("1995-02-15 00:00:00"), 7.0))
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_store_retention_plan")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val jan = 1995L * 12 + 1
    // part 0: versions Jan..May; keep Mar/Apr/May, expire Jan (2 rows,
    // 2000 cents) + Feb (2 rows, 2000 cents).
    assert(got(0L) == (5L, 2L, 4000L, 4L, jan + 2, jan + 4))
    // part 1: only 2 versions -> nothing to expire, kept window = all.
    assert(got(1L) == (2L, 0L, 0L, 0L, jan, jan + 1))
  }
}
