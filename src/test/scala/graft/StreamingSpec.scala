package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming front-end (§2.9): the engine's incremental loop
  * can be driven by a file stream with Trigger.AvailableNow; windowed
  * aggregation with watermark over the events table demonstrates the
  * streaming operator surface (the reference has no streaming framework —
  * SURVEY.md §2.9 — so this is the engine's micro-batch analog).
  */
class StreamingSpec extends SparkTestBase {

  test("file-stream windowed aggregation equals the batch computation") {
    // the file source streams a DIRECTORY; stage the single parquet file
    val src = s"$sfUnit/events.parquet"
    val dir = java.nio.file.Files.createTempDirectory("stream-ev").toString
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val schema = spark.read.parquet(dir).schema

    val stream = spark.readStream.schema(schema).parquet(dir)
      // parquet infers TIMESTAMP_NTZ; watermarks need TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val qname = "stream_out_" + System.nanoTime()
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(qname)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table(qname).collect()
      .map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val batch = spark.read.parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("incremental driver as stream analog: AvailableNow over doc batches") {
    // The Incremental loop IS the engine's streaming mode (micro-batch
    // with state tables). Verify a second invocation with no new input
    // is a no-op on the triples table (exactly-once semantics).
    import graft.core.{InputDoc, Span, SpanOps}
    import spark.implicits._
    val docs = spark.createDataset(Seq(
      InputDoc("s1", SpanOps.withOffsets(Seq(Span("text", "spark customer", "", 0))))))
    val dir = java.nio.file.Files.createTempDirectory("stream-inc").toString
    Incremental.run(spark, docs, dir, numBatches = 1)
    val t = Incremental.Tables(dir)
    val v1 = t.triples.latestSnapshot.get
    Incremental.run(spark, docs, dir, numBatches = 1) // no new work
    assert(t.triples.latestSnapshot.get == v1)
  }
}
