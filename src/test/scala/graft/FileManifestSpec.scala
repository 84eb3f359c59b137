package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder
import graft.store.FileManifest

class FileManifestSpec extends SparkSpecBase {

  private def writeRanged(n: Int, files: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    (0 until n).map(i => (i.toLong, (i % 100).toLong, s"r$i"))
      .toDF("k", "m", "payload")
      .repartitionByRange(files, col("k"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("manifest prunes files for a selective range; read stays exact") {
    val dir = writeRanged(n = 10000, files = 10)
    val manifest = FileManifest.build(spark, dir, Seq("k", "m"))
    assert(manifest.count() == 10)
    val (kept, total) = FileManifest.pruningStats(manifest, "k", 100L, 900L)
    assert(total == 10 && kept <= 2, s"kept $kept of $total")
    val pruned = FileManifest.prunedRead(spark, dir, manifest, "k", 100L, 900L)
      .orderBy("k").collect()
    val full = spark.read.parquet(dir)
      .filter(col("k") >= 100L && col("k") <= 900L)
      .orderBy("k").collect()
    assert(pruned.toSeq == full.toSeq)
  }

  test("non-clustered column cannot prune; z-order layout makes it prune") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-z").toString
    val df = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    // Laid out by x alone: every file spans the full y range -> no y pruning.
    df.repartitionByRange(8, col("x")).write.mode("overwrite").parquet(dir)
    val mx = FileManifest.build(spark, dir, Seq("y"))
    val (keptX, totalX) = FileManifest.pruningStats(mx, "y", 0L, 7L)
    assert(keptX == totalX, "x-ranged layout should not prune on y")
    // Z-ordered: the same y-range hits a strict subset of files.
    val zdir = java.nio.file.Files.createTempDirectory("graft-manifest-z2").toString
    ZOrder.layout(df, "x", "y", bits = 6, numPartitions = 8)
      .write.mode("overwrite").parquet(zdir)
    val mz = FileManifest.build(spark, zdir, Seq("y"))
    val (keptZ, totalZ) = FileManifest.pruningStats(mz, "y", 0L, 7L)
    assert(keptZ < totalZ, s"z-order layout failed to prune on y: $keptZ/$totalZ")
  }

  test("empty candidate set yields an empty relation with the full schema") {
    val dir = writeRanged(n = 100, files = 4)
    val manifest = FileManifest.build(spark, dir, Seq("k"))
    val out = FileManifest.prunedRead(spark, dir, manifest, "k", 5000L, 6000L)
    assert(out.columns.toSeq == Seq("k", "m", "payload"))
    assert(out.count() == 0)
  }
}
