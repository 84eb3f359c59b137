package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.streaming.EventStream

/** Round-15 pins: streaming bandit replay — per-user policy + replay
  * state across REAL micro-batch boundaries equals the batch
  * `q_e_bandit_replay` on the same events, with both users' streams
  * SPANNING trigger boundaries so the decision state genuinely
  * persists through `mapGroupsWithState`. */
class StreamingBanditSpec extends SparkSpecBase {

  private val HI = 150.0
  private val LO = 5.0
  private val arms =
    Seq("click", "error", "purchase", "signup", "view")

  test("streamed replay across 3 micro-batches equals the batch query") {
    import spark.implicits._
    // user 1: the DecomposeBanditSpec hand walk; user 2: a second
    // policy trajectory interleaved in event time.
    val rows: Seq[(Long, Long, Long, String, Double)] = Seq(
      (1L, 1000000000L, 1L, "view", LO),
      (2L, 2000000000L, 1L, "click", HI),
      (3L, 3000000000L, 1L, "click", LO),
      (4L, 4000000000L, 1L, "error", LO),
      (5L, 5000000000L, 1L, "purchase", HI),
      (6L, 6000000000L, 1L, "signup", LO),
      (7L, 7000000000L, 1L, "view", HI),
      (8L, 8000000000L, 1L, "purchase", LO),
      (11L, 1000000000L, 2L, "view", LO),
      (12L, 2000000000L, 2L, "view", HI),
      (13L, 3000000000L, 2L, "click", LO),
      (14L, 4000000000L, 2L, "view", LO))
    val dir = Files.createTempDirectory("graft-sband").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(2).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val batch = SparkEntry.queries("q_e_bandit_replay")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // Stream side: 3 event-time chunks, one file per trigger.
    val sdir = Files.createTempDirectory("graft-sband-stream").toString
    val chunks = Seq(rows.filter(_._2 <= 2000000000L),
      rows.filter(r => r._2 > 2000000000L && r._2 <= 5000000000L),
      rows.filter(_._2 > 5000000000L))
    assert(chunks.forall(_.nonEmpty))
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val tmp = Files.createTempDirectory(s"graft-sband-c$i").toString
      chunk.map { case (id, ts, u, ty, v) =>
        (u, ts, id, ty, if (v >= 100.0) 1L else 0L)
      }.toDF("user_id", "ts_ns", "event_id", "event_type", "r")
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
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.LongType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(sdir)
      .as[EventStream.BanditEv]
      .transform(EventStream.streamingBanditReplay(_, arms))
      .writeStream.format("memory").queryName("bandit_sink")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // Update mode re-emits per trigger; counters are monotone, so the
    // final state per user is the elementwise max.
    import org.apache.spark.sql.functions._
    val finalRows = spark.table("bandit_sink")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(expr("logged[0] + logged[1] + logged[2] + logged[3] " +
            "+ logged[4]").desc)))
      .filter(col("rn") === 1)
      .collect()
    val streamed = arms.indices.map { i =>
      arms(i) -> ((
        finalRows.map(_.getSeq[Long](1)(i)).sum,
        finalRows.map(_.getSeq[Long](2)(i)).sum,
        finalRows.map(_.getSeq[Long](3)(i)).sum))
    }.toMap
    // Hand totals over both users, then the batch-twin identity.
    assert(streamed("click") == ((3L, 2L, 1L)))
    assert(streamed("error") == ((1L, 1L, 0L)))
    assert(streamed("purchase") == ((2L, 2L, 1L)))
    assert(streamed("signup") == ((1L, 1L, 0L)))
    assert(streamed("view") == ((5L, 0L, 0L)))
    arms.foreach { a =>
      assert(streamed(a) == batch(a),
        s"$a: streamed final counters must equal the batch replay")
    }
  }
}
