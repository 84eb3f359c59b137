package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

/** Structured Streaming specs: replayed micro-batches must converge to the
  * same answer as the equivalent batch aggregation. */
class EventStreamSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def writeEventFiles(dir: String): Unit = {
    import spark.implicits._
    val base = 1700000000000L
    def batch(ids: Range, typ: String) = ids.map(i =>
      (i.toLong, new Timestamp(base + i * 1000L), (i % 3).toLong, typ, i * 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    batch(0 until 20, "click").write.parquet(s"$dir/b1")
    batch(20 until 40, "view").write.parquet(s"$dir/b2")
    // spark streaming file source reads a directory of files; flatten
    val all = spark.read.parquet(s"$dir/b1", s"$dir/b2")
    all.repartition(4).write.mode("overwrite").parquet(s"$dir/stream")
  }

  test("windowed streaming summary equals the batch aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    writeEventFiles(dir)
    val q = EventStream.replayParquetAsStream(spark, s"$dir/stream", schema,
      df => EventStream.windowedSummary(df, "1 minute", "2 minutes"),
      // Complete mode: Append would hold back the final window, since no
      // later event ever advances the watermark past it on a bounded replay.
      "stream_sink", org.apache.spark.sql.streaming.OutputMode.Complete())
    q.awaitTermination(60000)
    val streamed = spark.table("stream_sink")
      .select(col("event_type"), col("n"), col("total_value"))
      .groupBy("event_type")
      .agg(sum("n").as("n"), sum("total_value").as("total_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val batch = spark.read.parquet(s"$dir/stream")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed == batch)
  }

  test("streaming dedup drops replayed duplicate event ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dd").toString
    import spark.implicits._
    val base = 1700000000000L
    val rows = (0 until 10) ++ (0 until 10) // every id twice
    rows.zipWithIndex.map { case (id, i) =>
      (id.toLong, new Timestamp(base + i * 1000L), 1L, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.parquet(s"$dir/stream")
    val q = EventStream.replayParquetAsStream(spark, s"$dir/stream", schema,
      df => EventStream.dedupStream(df), "dedup_sink")
    q.awaitTermination(60000)
    val ids = spark.table("dedup_sink").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L until 10L))
  }

  test("session windows split on event-time gaps") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sw").toString
    import spark.implicits._
    val base = 1700000000000L
    // user 1: two bursts separated by 10 minutes -> two sessions
    val ts = Seq(0L, 60000L, 120000L, 720000L, 780000L)
    ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, new Timestamp(base + t), 1L, "click", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/stream")
    val q = EventStream.replayParquetAsStream(spark, s"$dir/stream", schema,
      df => EventStream.sessionWindows(df, "5 minutes", "10 minutes"),
      "session_sink", org.apache.spark.sql.streaming.OutputMode.Complete())
    q.awaitTermination(60000)
    val sessions = spark.table("session_sink")
      .orderBy("session_start")
      .collect().map(r => r.getAs[Long]("n_events"))
    assert(sessions.toSeq == Seq(3L, 2L))
  }

  test("sessionize accumulates per-user state") {
    import spark.implicits._
    val base = 1700000000000L
    val events = (0 until 12).map(i => EventStream.SessionEvent(
      (i % 2).toLong, new Timestamp(base + i * 1000L), 2.0)).toDS()
    // batch Dataset works through the same state function via groupByKey
    val out = events.groupByKey(_.user_id).mapGroups { (uid, rows) =>
      val rs = rows.toSeq
      EventStream.SessionSummary(uid, rs.size, rs.map(_.value).sum,
        rs.map(_.ts).maxBy(_.getTime))
    }.collect().map(s => s.user_id -> ((s.n_events, s.total_value))).toMap
    assert(out(0L) == ((6L, 12.0)))
    assert(out(1L) == ((6L, 12.0)))
  }
}
