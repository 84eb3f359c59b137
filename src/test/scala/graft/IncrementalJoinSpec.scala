package graft

import graft.store.IncrementalJoin

/** Delta-join maintenance: J_old ∪ ΔJ must equal the full post-delta
  * join, with the ΔA ⋈ ΔB corner counted exactly once. */
class IncrementalJoinSpec extends SparkSpecBase {

  test("maintained view equals the one-shot join, delta-delta corner once") {
    import spark.implicits._
    // Keys exercise every case: 1 old-only B, 2 B arrives in delta,
    // 3 both sides delta-extend, 4 delta-only on both sides.
    val aOld = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "av")
    val dA = Seq((3L, "a4"), (4L, "a5")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (3L, "b2")).toDF("k", "bv")
    val dB = Seq((2L, "b3"), (3L, "b4"), (4L, "b5")).toDF("k", "bv")
    val jOld = aOld.join(bOld, Seq("k"))
    val maintained = jOld
      .unionByName(IncrementalJoin.deltaJoin(aOld, bOld, dA, dB, Seq("k")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val oneShot = aOld.unionByName(dA)
      .join(bOld.unionByName(dB), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(maintained.sorted.toSeq == oneShot.sorted.toSeq)
    // (3, a4, b4) and (4, a5, b5) are delta-delta pairs: present once.
    assert(maintained.count(_ == ((4L, "a5", "b5"))) == 1)
    assert(maintained.count(_ == ((3L, "a4", "b4"))) == 1)
  }

  test("stream-maintained join equals the one-shot join across micro-batches") {
    import spark.implicits._
    val left = Seq((1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "av")
    val b1 = Seq((1L, "b1"), (2L, "b2"))
    val b2 = Seq((3L, "b3"), (1L, "b4"))
    // One parquet file per micro-batch (the repo's replay harness shape).
    val dir = java.nio.file.Files.createTempDirectory("graft-ijoin").toString
    b1.toDF("k", "bv").coalesce(1).write.mode("append").parquet(dir)
    b2.toDF("k", "bv").coalesce(1).write.mode("append").parquet(dir)
    val deltas = spark.readStream
      .schema(b1.toDF("k", "bv").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    val landed = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = graft.streaming.EventStream.streamingJoinMaintenance(
      deltas, left, Seq("k"),
      (dj, _) => landed.synchronized {
        landed ++= dj.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getString(2))): Unit
      })
    q.awaitTermination()
    val oneShot = left.join((b1 ++ b2).toDF("k", "bv"), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(landed.sorted.toSeq == oneShot.sorted.toSeq)
  }

  test("empty deltas append nothing") {
    import spark.implicits._
    val a = Seq((1L, "a")).toDF("k", "av")
    val b = Seq((1L, "b")).toDF("k", "bv")
    val none = a.filter("k < 0")
    val noneB = b.filter("k < 0")
    assert(IncrementalJoin.deltaJoin(a, b, none, noneB, Seq("k")).count() == 0)
  }
}
