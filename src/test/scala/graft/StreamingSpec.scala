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

  test("stream-stream interval join: streaming result equals batch result") {
    val schema = eventsBatch.schema
    // two independent readers of the same source = two genuine streams
    val pStream = spark.readStream.schema(schema).parquet(streamDir)
    val cStream = spark.readStream.schema(schema).parquet(streamDir)
    val q = EventStreaming.attributionJoin(pStream, cStream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("attr_out")
    val batch = EventStreaming.attributionJoin(eventsBatch, eventsBatch)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0,
      "streaming emitted a pair the batch join doesn't have")
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

  test("streaming LSH near-dedup drops re-delivered near-duplicates, equals batch") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val baseText = "the quick brown fox jumps over the lazy dog while seventeen " +
      "sleepy pelicans watch from the old wooden pier beside the harbor gate " +
      "and the evening tide rolls quietly across the northern sand flats"
    val docs1 = Seq( // originals
      (1L, baseText, at(0)),
      (2L, "completely different second document about parquet row groups " +
        "column chunks page headers dictionary encoding and statistics metadata " +
        "stored in the footer of every file written by the engine", at(60)),
      (3L, "third unrelated text mentioning watermarks state stores triggers " +
        "micro batches offsets checkpoints and the available now execution mode " +
        "of the structured streaming runtime inside this test", at(120)))
    val docs2 = Seq( // re-deliveries: a near-dup of d1, an exact dup of d2, one new doc
      (4L, baseText.replace("northern sand flats", "southern sand flats"), at(300)),
      (5L, docs1(1)._2, at(360)),
      (6L, "a fourth genuinely new document describing broadcast joins shuffle " +
        "partitions adaptive execution skew handling and whole stage code " +
        "generation in the query engine being verified here", at(420)))
    // flushers: push the 1h watermark past every real doc so the append-mode
    // per-doc aggregation emits them (excluded from the comparison)
    val flush1 = Seq((99L, "flush one marker document text", at(5 * 3600)))
    val flush2 = Seq((100L, "flush two marker document text", at(6 * 3600)))

    // one parquet FILE per micro-batch, in the source root (the file source
    // does not recurse into subdirectories), oldest-first mtimes so
    // maxFilesPerTrigger=1 replays them in delivery order
    val d = Files.createTempDirectory("graft-stream-neardup")
    Seq(docs1, docs2, flush1, flush2).zipWithIndex.foreach { case (batch, i) =>
      val tmp = Files.createTempDirectory(s"graft-neardup-b$i").resolve("out")
      batch.toDF("doc_id", "text", "ts").coalesce(1).write.parquet(tmp.toString)
      val part = tmp.toFile.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new java.io.File(d.toFile, f"b$i%02d.parquet")
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(1700000000000L + i * 60000L)
    }
    val schema = docs1.toDF("doc_id", "text", "ts").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
    val q = EventStreaming.nearDedupeStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("neardup_out")
      .filter(col("doc_id") < 99L).select("doc_id").as[Long].collect().toSet
    val all = (docs1 ++ docs2 ++ flush1 ++ flush2).toDF("doc_id", "text", "ts")
    val batch = EventStreaming.nearDedupeBatch(all)
      .filter(col("doc_id") < 99L).select("doc_id").as[Long].collect().toSet
    // the near-dup (4) and the exact dup (5) are dropped in BOTH worlds;
    // originals and the genuinely new doc survive in both
    assert(batch === Set(1L, 2L, 3L, 6L))
    assert(streamed === batch)
  }

  test("stream-static decontamination: streaming equals batch, zero state") {
    val docs = Tables.load(spark, sfDir, "documents")
    val blocklist = docs.filter(pmod(col("doc_id"), lit(10)) === 3)
      .select(expr(graft.pipeline.PortableHash.sparkCharHash("text"))
        .as("content_poly"))
      .distinct()
    val d = Files.createTempDirectory("graft-stream-decontam")
    docs.write.mode("overwrite").parquet(d.toString)
    val stream = spark.readStream.schema(docs.schema).parquet(d.toString)
    val q = EventStreaming.decontaminateStream(stream, blocklist)
      .select(col("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("decontam_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("decontam_out")
    val batch = EventStreaming.decontaminateStream(docs, blocklist).select(col("doc_id"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    // every blocked doc really is gone
    assert(streamed.filter(pmod(col("doc_id"), lit(10)) === 3).count() === 0)
  }

  test("sliding windows emit overlapping windows") {
    val out = EventStreaming.slidingRates(eventsBatch)
    val total = eventsBatch.count()
    // 1h/15m slide → every event lands in 4 windows
    assert(out.agg(sum(col("n"))).collect().head.getLong(0) === total * 4)
  }
}
