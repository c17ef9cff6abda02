package graft

import graft.streaming.EventStreaming
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Structured Streaming parity: the same transforms produce identical
  * results through the streaming engine (memory sink, file source) as in
  * batch — plus stateful sessionization matches the window-based batch
  * equivalent row for row. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def eventsBatch = Tables.load(spark, sfDir, "events")

  /** Stage events parquet (rewritten, because the raw file's ns timestamps
    * are unreadable to the streaming file source too) into a stream dir. */
  private lazy val streamDir: String = {
    val d = Files.createTempDirectory("graft-stream-src")
    eventsBatch.write.mode("overwrite").parquet(d.toString)
    d.toString
  }

  test("windowed aggregation: streaming result equals batch result") {
    val schema = eventsBatch.schema
    val stream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreaming.hourlyAgg(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append mode only emits watermark-closed windows; every emitted row
    // must match the batch computation exactly
    val streamed = spark.table("hourly_out")
      .select(col("hour_start"), col("event_type"), col("n"), col("total_value"))
    val batch = EventStreaming.hourlyAgg(eventsBatch)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0,
      "streaming emitted a row the batch computation doesn't have")
  }

  test("streaming exact-dedup drops re-delivered events, equals batch distinct") {
    // duplicate the source: every event delivered twice
    val schema = eventsBatch.schema
    val d = Files.createTempDirectory("graft-stream-dup")
    eventsBatch.unionAll(eventsBatch).write.mode("overwrite").parquet(d.toString)
    val stream = spark.readStream.schema(schema).parquet(d.toString)
    val q = EventStreaming.dedupeStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("dedup_out")
    assert(streamed.count() === eventsBatch.count())
    assert(streamed.select(col("event_id")).distinct().count() === eventsBatch.count())
  }

  test("stateful sessionization (flatMapGroupsWithState) matches batch window equivalent") {
    import spark.implicits._
    val ds = eventsBatch
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStreaming.Event]
    val stateful = EventStreaming.sessionize(ds).collect()
      .map(r => (r.user_id, r.event_id) -> r.session_id).toMap
    val batch = EventStreaming.sessionizeBatch(eventsBatch).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stateful.size === batch.size)
    assert(stateful === batch)
  }

  test("sliding windows emit overlapping windows") {
    val out = EventStreaming.slidingRates(eventsBatch)
    val total = eventsBatch.count()
    // 1h/15m slide → every event lands in 4 windows
    assert(out.agg(sum(col("n"))).collect().head.getLong(0) === total * 4)
  }
}
