package graft

import java.nio.file.Files

/** Wave-22 pins: Lehr sample-size planner (hand integer ceilings,
  * degenerate-rate sentinels) and HHI concentration (monopoly = 10000,
  * even split = 10000/n, DOJ threshold flag). */
class PowerHhiSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  test("power planner: hand rates produce the exact Lehr ceilings") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-power").toString
    // 10 users over 5 days (day = user % 5); 'buy' from 2 users,
    // 'view' from all 10, 'rare' from 1.
    val rows =
      (1L to 10L).map(u => (u, "view")) ++
      Seq((1L, "buy"), (2L, "buy"), (3L, "rare"))
    rows.zipWithIndex.map { case ((u, ty), i) =>
      (i.toLong, (u % 5) * dayNs + i, u, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_exp_power")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // buy: c=2, u=10 → n = ceil(1600*10*8/4) = 32000; total 64000;
    // days: observed span = days 0..4 → 5 days; ceil(64000*5/10)=32000.
    assert(got("buy") == (10L, 2L, 200000L, 32000L, 64000L, 32000L))
    // rare: c=1 → n = ceil(1600*10*9/1) = 144000.
    assert(got("rare") == (10L, 1L, 100000L, 144000L, 288000L, 144000L))
    // view: c=u → sentinel everywhere (no headroom to lift).
    assert(got("view") == (10L, 10L, 1000000L, -1L, -1L, -1L))
  }

  test("continuous power planner: hand moments produce the exact ceiling") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pmean").toString
    // 'buy' cents {100, 300}: n=2, sx=400, sxx=100000 →
    // n*sxx - sx^2 = 40000; n = ceil(6400*40000/160000) = 1600.
    // 'flat' cents {200, 200}: zero variance → n_per_arm = 0 exactly
    // (ceil of 0 with the +sx^2-1 trick stays 0).
    val rows = Seq((1L, "buy", 1.00), (2L, "buy", 3.00),
      (3L, "flat", 2.00), (4L, "flat", 2.00))
    rows.zipWithIndex.map { case ((u, ty, v), i) =>
      (i.toLong, i * 1000L + 1, u, ty, v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_exp_power_means")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("buy") == (2L, 200L, 1600L, 3200L))
    assert(got("flat") == (2L, 200L, 0L, 0L))
  }

  test("heatmap: hand events land in their dow/hour cells with exact shares") {
    import spark.implicits._
    val hourNs = 3600L * 1000 * 1000 * 1000
    val dir = Files.createTempDirectory("graft-heat").toString
    // Day 0 = Thursday (epoch) → dow (0+4)%7 = 4. Three events Thursday
    // 01:00, one event Friday 13:00.
    val rows = Seq((0L, 1L), (0L, 1L), (0L, 1L), (1L, 13L))
    rows.zipWithIndex.map { case ((d, h), i) =>
      (i.toLong, d * dayNs + h * hourNs + i, 1L, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_e_heatmap")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((4L, 1L, 3L, 7500L), (5L, 13L, 1L, 2500L)))
  }

  test("HHI: monopoly scores 10000, even split 10000/n, flag at 2500") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hhi").toString
    // Nation 0: one supplier (monopoly). Nation 1: four equal suppliers
    // → HHI = 2500 exactly (flag fires at >=). Nation 2: five equal
    // suppliers → 2000, no flag.
    val supp = Seq((1L, 0), (2L, 1), (3L, 1), (4L, 1), (5L, 1),
      (6L, 2), (7L, 2), (8L, 2), (9L, 2), (10L, 2))
    supp.toDF("s_suppkey", "s_nationkey")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/supplier.parquet")
    Seq((0, "ALPHA"), (1, "BRAVO"), (2, "CHARLIE"))
      .toDF("n_nationkey", "n_name")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/nation.parquet")
    (1L to 10L).zipWithIndex.map { case (sk, i) =>
      (i.toLong, sk, 100.0)
    }.toDF("l_orderkey", "l_suppkey", "l_extendedprice")
      .repartition(1).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_agg_hhi")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("ALPHA") == (1L, 10000L, 10000L, 1L), "monopoly")
    assert(got("BRAVO") == (4L, 40000L, 2500L, 1L), "4-way split at cut")
    assert(got("CHARLIE") == (5L, 50000L, 2000L, 0L), "5-way under cut")
  }
}
