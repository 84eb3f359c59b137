package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryException, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Streaming state durability (VERDICT r13 item 6): kill a stateful
  * streaming query MID-CORPUS with an injected sink crash, restart it
  * from the same checkpoint, and require the merged output to equal an
  * uninterrupted run bit for bit. 100 TB streaming is a restart story —
  * a pipeline that cannot resume its window state after an executor/
  * driver loss re-counts or drops whatever was in flight.
  *
  * Mechanics under test:
  *  - offset/commit log: the crashed batch is RE-EXECUTED on restart
  *    with the SAME batchId (the foreachBatch sink writes per-batch
  *    directories with overwrite, the idempotence contract Spark's
  *    exactly-once story requires of foreachBatch sinks);
  *  - state store: window aggregates whose events SPAN the crash point
  *    (every window here crosses a file boundary) must resume from the
  *    persisted state, not recount from zero;
  *  - watermark: persisted and resumed, so late-arrival semantics are
  *    identical to the uninterrupted run.
  * Runs twice: default HDFS-backed state store and RocksDB
  * (`RocksDBStateStoreProvider`, the 100 TB configuration recommended in
  * CLUSTER.md — state no longer bounded by executor heap). */
class StreamRecoverySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private val base = 1700000000000L
  private val minMs = 60000L

  /** Land `df` as ONE flat parquet file `dir/f<i>.parquet` (the file
    * stream source does not recurse into per-write subdirectories) with a
    * strictly-increasing mtime, so the source (which orders candidates by
    * modification time) replays in event-time order — otherwise a
    * late-arriving early file could fall behind the watermark and the two
    * runs would legitimately diverge. */
  private def landFile(df: DataFrame, dir: String, i: Int, tick: Int): Unit = {
    val tmp = Files.createTempDirectory("graft-recover-land").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Option(new java.io.File(tmp).listFiles()).get
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file written under $tmp"))
    Files.createDirectories(Paths.get(dir))
    val dst = Paths.get(s"$dir/f$i.parquet")
    Files.move(part.toPath, dst)
    Files.setLastModifiedTime(dst,
      FileTime.fromMillis(1700000000000L + tick * 10000L))
  }

  /** 8 data files (file i carries events in minutes i AND i+1, so every
    * window's state spans a file boundary) plus a far-future sentinel
    * that advances the watermark past every real window. */
  private def writeInput(dir: String): Unit = {
    import spark.implicits._
    (0 until 8).foreach { i =>
      landFile(Seq(
        (i * 2L, new Timestamp(base + i * minMs), i.toLong % 3,
          "click", 1.0 * i),
        (i * 2L + 1, new Timestamp(base + (i + 1) * minMs), (i + 1).toLong % 3,
          "view", 2.0 * i))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
        dir, i, i)
    }
    landFile(
      Seq((999L, new Timestamp(base + 600 * minMs), 0L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value"),
      dir, 8, 99)
  }

  /** One streaming run: file-per-trigger replay → windowedSummary →
    * foreachBatch parquet sink (per-batch dir, overwrite = idempotent on
    * batch replay). `failAtBatch` injects a crash BEFORE that batch's
    * write commits — the query dies exactly as a sink/executor fault
    * would. Returns the thrown cause, if any. */
  private def runOnce(in: String, out: String, cp: String,
                      failAtBatch: Option[Long]): Option[Throwable] = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = EventStream.windowedSummary(stream, "1 minute", "2 minutes")
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"), col("approx_users"))
      .writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", cp)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (failAtBatch.contains(batchId))
          throw new RuntimeException(s"injected crash at batch $batchId")
        batch.write.mode("overwrite").parquet(s"$out/batch_$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try { q.awaitTermination(); None }
    catch { case e: StreamingQueryException =>
      Option(e.cause).orElse(Some(e))
    } finally { if (q.isActive) q.stop() }
  }

  private def readSink(out: String): Seq[(Long, String, Long, Double, Long)] = {
    val dirs = Option(new java.io.File(out).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
      .map(_.getPath)
    if (dirs.isEmpty) Seq.empty
    else spark.read.parquet(dirs.toIndexedSeq: _*)
      .collect()
      .map(r => (r.getAs[Timestamp]("w_start").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("total_value"), r.getAs[Long]("approx_users")))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  private def recoveryRoundTrip(tag: String): Unit = {
    val root = Files.createTempDirectory(s"graft-recover-$tag").toString
    val in = s"$root/in"
    writeInput(in)

    // Uninterrupted reference run.
    assert(runOnce(in, s"$root/ref_out", s"$root/ref_cp", None).isEmpty)
    val ref = readSink(s"$root/ref_out")
    assert(ref.nonEmpty, "reference run emitted nothing")

    // Crash at batch 4 (mid-corpus: f0-f3 committed, state for windows
    // [3,4) and [4,5) in flight), then resume from the SAME checkpoint.
    val boom = runOnce(in, s"$root/out", s"$root/cp", Some(4L))
    assert(boom.exists(_.getMessage.contains("injected crash")),
      s"expected the injected crash to kill the first run, got $boom")
    val partial = readSink(s"$root/out")
    assert(partial.size < ref.size,
      "crash landed too late to test recovery (all output already emitted)")
    assert(runOnce(in, s"$root/out", s"$root/cp", None).isEmpty)

    val recovered = readSink(s"$root/out")
    assert(recovered == ref,
      s"recovered output != uninterrupted run\nref=$ref\ngot=$recovered")

    // And both equal the batch computation over the closed windows.
    val batch = spark.read.parquet(in)
      .filter(col("event_type") =!= "sentinel")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"), col("approx_users"))
      .collect()
      .map(r => (r.getAs[Timestamp]("w_start").getTime,
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("total_value"), r.getAs[Long]("approx_users")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(recovered == batch,
      s"recovered output != batch computation\nbatch=$batch\ngot=$recovered")
  }

  test("stateful streaming query crashes mid-corpus and resumes from " +
      "checkpoint to the exact uninterrupted output (HDFS state store)") {
    recoveryRoundTrip("hdfs")
  }

  test("same recovery under RocksDBStateStoreProvider (the CLUSTER.md " +
      "100 TB state-store configuration)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try recoveryRoundTrip("rocksdb")
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
