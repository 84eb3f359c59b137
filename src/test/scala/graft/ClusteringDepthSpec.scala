package graft

import java.nio.file.Files

/** Round-14 wave-13 pins: file-overlap clustering depth — a hand
  * keyspace where both layouts' sweep profiles are fully worked out. */
class ClusteringDepthSpec extends SparkSpecBase {

  test("hand keyspace 0..159: interleaved depth 16/14.5, clustered depth 1") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-depth").toString
    (0L until 160L).map(k => (k, 1L)).toDF("l_orderkey", "l_linenumber")
      .repartition(3).write.mode("overwrite")
      .parquet(s"$dir/lineitem.parquet")
    // Interleaved (k % 16): file i covers [i, i+144] — the sweep climbs
    // 1..16 over [0,16), holds 16 over [16,145) (width 129), descends
    // 15..1 over [145,160). dw = 136 + 16*129 + 120 = 2320 over width
    // 160 → avg 14.5 (145000 bp). Range (stride = 159//16+1 = 10):
    // 16 disjoint [10i, 10i+9] files → depth 1 everywhere, avg 10000 bp.
    val got = SparkEntry.queries("q_store_clustering_depth")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("interleaved") == (16L, 16L, 145000L, 160L))
    assert(got("range_clustered") == (16L, 1L, 10000L, 160L))
  }

  test("single file degenerates to depth 1 in both layouts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-depth1").toString
    Seq((5L, 1L)).toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = SparkEntry.queries("q_store_clustering_depth")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("interleaved") == (1L, 10000L))
    assert(got("range_clustered") == (1L, 10000L))
  }
}
