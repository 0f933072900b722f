package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.queries.QueryPack

/** Streaming correctness: the streaming transforms must produce the same
  * answers as their batch twins over the events table (same declarative
  * plan, different source).
  */
class StreamingSuite extends SparkTestBase {

  private def events = QueryPack.t(spark, sf(), "events")

  test("windowed stats: streaming over file source equals batch") {
    // batch twin
    val batch = Streaming.windowedStats(events)
      .orderBy("window_start", "event_type").collect()

    // stream the same rows through a parquet file stream
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, events.schema)
    val result = Streaming.runToMemory(Streaming.windowedStats(stream), "win_stats",
      org.apache.spark.sql.streaming.OutputMode.Complete())
      .orderBy("window_start", "event_type").collect()

    assert(result.toSeq == batch.toSeq)
  }

  test("session windows count all events per user") {
    val sessions = Streaming.sessionWindows(events.filter(col("user_id") < 20))
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sess").toString
    events.filter(col("user_id") < 20).write.mode("overwrite").parquet(dir)
    val stream = Streaming.fileStream(spark, dir, events.schema)
    val got = Streaming.runToMemory(Streaming.sessionWindows(stream), "sessions",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val batchTotal = events.filter(col("user_id") < 20).count()
    assert(got.agg(sum("n_events")).head().getLong(0) == batchTotal)
    // session count matches the batch gaps-and-islands computation shape
    assert(got.count() == sessions.count())
  }

  test("streaming dedup drops replayed duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dup").toString
    val slice = events.filter(col("user_id") < 5)
    slice.write.mode("overwrite").parquet(s"$dir/batch1")
    slice.write.mode("overwrite").parquet(s"$dir/batch2") // exact replay
    val stream = Streaming.fileStream(spark, s"$dir/batch*", events.schema)
    val got = Streaming.runToMemory(
      Streaming.streamingDedup(stream, Seq("event_id")), "deduped")
    assert(got.count() == slice.count()) // each event survives exactly once
  }

  test("mapGroupsWithState running totals match groupBy aggregate") {
    import spark.implicits._
    val in = events.filter(col("user_id") < 10)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
      .as[Streaming.EventIn]
    val got = Streaming.runningTotals(in)
      .groupByKey(_.user_id).reduceGroups((a, b) => if (a.n > b.n) a else b)
      .map(_._2).collect().map(u => (u.user_id, u.n)).toMap
    val want = events.filter(col("user_id") < 10).groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }
}
