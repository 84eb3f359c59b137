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

  test("bloom prune: no false negatives, exact answer, and real pruning") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // High-cardinality column `v` scattered so min/max intervals are
    // useless per file — the case blooms exist for.
    val df = (0 until 4000).map(i => (i.toLong, (i * 2654435761L) % 10000))
      .toDF("k", "v")
    df.repartitionByRange(8, col("k")).write.mode("overwrite").parquet(dir)
    val blooms = FileManifest.buildBloom(spark, dir, "v")
    assert(blooms.count() == 8)
    val probe = ((123L * 2654435761L) % 10000).toString
    val got = FileManifest.bloomPrunedRead(spark, dir, blooms, "v", probe)
      .select("k").collect().map(_.getLong(0)).toSet
    val want = df.filter(col("v").cast("string") === probe)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == want, "bloom-pruned read must equal the exact filter")
    assert(want.nonEmpty, "probe must actually hit")
    // A value absent from the data prunes every file (up to fp noise:
    // 8192 bits / ~500 distinct per file keeps fp rate well under 1%).
    val gone = FileManifest.bloomPrunedRead(spark, dir, blooms, "v", "999999")
    assert(gone.count() == 0)
  }

  test("bloom bitset stays fixed-size however many rows a file holds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-sz").toString
    (0 until 20000).map(i => (i.toLong, i.toLong)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val blooms = FileManifest.buildBloom(spark, dir, "v").collect()
    assert(blooms.length == 1)
    assert(blooms.head.getAs[Array[Byte]]("bloom").length == FileManifest.BloomBits / 8)
  }
}
