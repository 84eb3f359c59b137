package graft

import org.apache.spark.sql.functions._

import graft.llm.DetKMeans

class DetKMeansSpec extends SparkSpecBase {

  private def emb(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("quantization: floor(x*1e6 + 0.5), negatives included") {
    import spark.implicits._
    val u = Seq((1L, Seq(0.5f, -0.5f, 0.0f, 1.25f))).toDF("vec_id", "embedding")
      .select(DetKMeans.toUnits(col("embedding")).as("u"))
      .head.getSeq[Long](0)
    // 0.5f widens to exactly 0.5; -0.5*1e6 + 0.5 = -499999.5 floors DOWN.
    assert(u == Seq(500000L, -500000L, 0L, 1250000L))
  }

  test("separable clusters recover exactly, deterministically") {
    val dim = 4
    def v(base: Float) = Seq.tabulate(dim)(i => base + i * 0.001f)
    val pts = (0L until 10L).map(i => (i, v(0.0f))) ++
      (10L until 20L).map(i => (i, v(5.0f))) ++
      (20L until 30L).map(i => (i, v(-5.0f)))
    val (assign, centroids) = DetKMeans.fit(emb(pts: _*), "vec_id", "embedding",
      k = 3, iters = 4, dim = dim)
    val byCluster = assign.groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1)).sorted.toSeq
    assert(byCluster == Seq(10L, 10L, 10L))
    // Members of one group all land together.
    val cids = assign.filter(col("id") < 10).select("cid").distinct().count()
    assert(cids == 1L)
    // Bit-identical across a re-run (no seed drift, no float order).
    val (assign2, _) = DetKMeans.fit(emb(pts: _*), "vec_id", "embedding",
      k = 3, iters = 4, dim = dim)
    assert(assign.select("id", "cid").collect().toSet ==
      assign2.select("id", "cid").collect().toSet)
    assert(centroids.count() == 3)
  }

  test("assignment ties break to the smallest centroid id") {
    import spark.implicits._
    // Two centroids equidistant from the probe point.
    val pts = DetKMeans.unitPoints(
      emb((0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))),
      "vec_id", "embedding")
    val centroids = Seq((0L, Seq(0L, 0L)), (1L, Seq(2000000L, 0L))).toDF("cid", "c")
    val probe = DetKMeans.assignTo(pts, centroids)
      .filter(col("id") === 2).head
    assert(probe.getLong(2) == 0L) // cid 0 wins the tie
    assert(probe.getLong(3) == 1000000L * 1000000L)
  }

  test("grouped fit equals separate per-slice fits (the PQ oracle's premise)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{posexplode, slice}
    val rnd = new scala.util.Random(7)
    val data = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
    val df = data.toDF("vec_id", "embedding")
    val pts = df.select(col("vec_id").as("id"),
        posexplode(org.apache.spark.sql.functions.array(
          slice(col("embedding"), 1, 4), slice(col("embedding"), 5, 4)))
          .as(Seq("g", "sub")))
      .select(col("g").cast("long").as("g"), col("id"),
        DetKMeans.toUnits(col("sub")).as("u"))
    val (_, grouped) = DetKMeans.fitGrouped(pts, k = 3, iters = 2, dim = 4)
    val groupedSet = grouped.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSet
    val separateSet = (0 until 2).flatMap { s =>
      val sub = df.select(col("vec_id"),
        slice(col("embedding"), s * 4 + 1, 4).as("sub"))
      DetKMeans.fit(sub, "vec_id", "sub", k = 3, iters = 2, dim = 4)._2
        .collect().map(r => (s.toLong, r.getLong(0), r.getSeq[Long](1).toSeq))
    }.toSet
    assert(groupedSet == separateSet)
  }

  test("centroid update is the floored integer mean; empty clusters drop") {
    import spark.implicits._
    val assign = Seq(
      (1L, Seq(1L, 10L), 0L, 0L),
      (2L, Seq(2L, 11L), 0L, 0L),
      (3L, Seq(2L, 11L), 0L, 0L)).toDF("id", "u", "cid", "d")
    val c = DetKMeans.updateCentroids(assign, dim = 2).head
    // (1+2+2)/3 = 1.666 → 1;  (10+11+11)/3 = 10.666 → 10
    assert(c.getLong(0) == 0L && c.getSeq[Long](1) == Seq(1L, 10L))
    // k=2 fit over points that all sit at one spot: the far seed loses
    // every point after round 1 and disappears from the centroid set.
    val one = emb((0L until 5L).map(i => (i, Seq(1.0f, 1.0f))): _*)
    val (_, cents) = DetKMeans.fit(one, "vec_id", "embedding", k = 2, iters = 2, dim = 2)
    assert(cents.count() == 1L)
  }
}
