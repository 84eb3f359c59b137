package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStream

/** Round-14 wave-26 pins: streaming windowed funnel — per-user anchor
  * state across REAL micro-batch boundaries equals the batch
  * `q_e_window_funnel` on the same events. */
class StreamFunnelSpec extends SparkSpecBase {

  private val dayNs = 86400L * 1000 * 1000 * 1000

  test("streamed levels across 3 micro-batches equal the batch funnel") {
    import spark.implicits._
    // The FunnelXmrSpec journeys, split into 3 event-time chunks so
    // every user's chain SPANS a micro-batch boundary.
    val rows: Seq[(Long, Long, String)] = Seq(
      (1L, 0L, "signup"), (1L, dayNs, "click"), (1L, 2 * dayNs, "purchase"),
      (2L, 0L, "signup"), (2L, 8 * dayNs, "click"),
      (3L, 0L, "signup"), (3L, dayNs, "click"), (3L, 9 * dayNs, "purchase"),
      (4L, 0L, "click"), (4L, dayNs, "purchase"),
      (5L, 0L, "purchase"), (5L, dayNs, "signup"), (5L, 2 * dayNs, "click"),
      (5L, 3 * dayNs, "purchase"),
      (6L, 0L, "signup"))
    val dir = Files.createTempDirectory("graft-sfun").toString
    // Batch side: the registered query's events table.
    rows.zipWithIndex.map { case ((u, ts, ty), i) =>
      (i.toLong, ts, u, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("q_e_window_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Stream side: 3 chunk files in event-time order, one per trigger,
    // ascending mtimes so the file source replays them in order.
    val sdir = Files.createTempDirectory("graft-sfun-stream").toString
    val chunks = Seq(
      rows.filter(_._2 <= 0L), rows.filter(r => r._2 > 0L && r._2 <= 2 * dayNs),
      rows.filter(_._2 > 2 * dayNs))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft-sfun-c$i").toString
      chunk.map { case (u, ts, ty) => (u, ts, ty) }
        .toDF("user_id", "ts_ns", "event_type")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      val dst = Paths.get(sdir, f"chunk-$i%03d.parquet")
      Files.move(part.toPath, dst, StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_ns",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(sdir)
      .as[EventStream.FunnelEv]
      .transform(EventStream.streamingWindowFunnel(_))
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // Update mode re-emits a user's level each trigger; the FINAL level
    // is the max (levels are monotone under in-order arrival).
    val streamedLevels = spark.table("funnel_sink")
      .groupBy("user_id").agg(org.apache.spark.sql.functions.max("level"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(streamedLevels == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 0L,
      5L -> 3L, 6L -> 1L))
    val streamedHist = streamedLevels.values.groupBy(identity)
      .map { case (l, vs) => l -> vs.size.toLong }
    assert(streamedHist == batch, "streamed histogram == batch query")
  }
}
