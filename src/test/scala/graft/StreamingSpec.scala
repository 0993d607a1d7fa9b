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

  test("streaming gap sessionize: watermark-closed sessions equal batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val sessions = graft.streaming.StreamKb.sessionize(
      mem.toDS(), gapSec = 1800, watermarkDelay = "0 seconds")
    val qname = "closed_sessions_" + System.nanoTime()
    val q = sessions.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      // u1: two sessions (gap 50 min between 00:10 and 01:00); u2: one
      mem.addData((1L, ts("2024-01-01 00:00:00")),
        (1L, ts("2024-01-01 00:10:00")), (2L, ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // intra-batch close emitted immediately, before any timeout
      val early = spark.table(qname).as[(Long, java.sql.Timestamp,
        java.sql.Timestamp, Long)].collect().toSet
      assert(early.contains((1L, ts("2024-01-01 00:00:00"),
        ts("2024-01-01 00:10:00"), 2L)))
      // far-future rows advance the watermark past every open timeout;
      // the extra add gives the no-data timeout batch a trigger
      mem.addData((99L, ts("2024-01-02 00:00:00")))
      q.processAllAvailable()
      mem.addData((99L, ts("2024-01-03 00:00:00")))
      q.processAllAvailable()
      val got = spark.table(qname).as[(Long, java.sql.Timestamp,
        java.sql.Timestamp, Long)].collect().toSet
        .filter(_._1 != 99L)
      val want = Set(
        (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L),
        (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 1L),
        (2L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:05:00"), 1L))
      assert(got === want)

      // batch twin agrees: same sessions from ops.Sessionize.byGap
      val ev = Seq((1L, ts("2024-01-01 00:00:00"), 1L),
        (1L, ts("2024-01-01 00:10:00"), 2L), (2L, ts("2024-01-01 00:05:00"), 3L),
        (1L, ts("2024-01-01 01:00:00"), 4L)).toDF("user_id", "ts", "event_id")
      val batch = graft.ops.Sessionize.byGap(ev, "user_id", "ts", "event_id",
          gapUs = 1800L * 1000000)
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"),
          count(lit(1)).as("n"))
        .select("user_id", "s", "e", "n")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
        .collect().toSet
      assert(batch === want)
    } finally q.stop()
  }

  test("stream-stream interval join: in-window pairs only, equals batch join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    implicit val sqlCtx = spark.sqlContext

    val imps = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = graft.streaming.StreamKb.intervalJoin(
      imps.toDF().toDF("user_id", "ts", "id"),
      clicks.toDF().toDF("user_id", "ts", "id"),
      keyCol = "user_id", tsCol = "ts",
      windowSec = 60, watermarkDelay = "0 seconds")
      .select(col("l_id"), col("r_id"))
    val qname = "clickthrough_" + System.nanoTime()
    val q = joined.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00"), "i1"),
        (2L, ts("2024-01-01 00:00:00"), "i2"))
      clicks.addData(
        (1L, ts("2024-01-01 00:00:30"), "c1"),   // in window -> joins i1
        (1L, ts("2024-01-01 00:02:00"), "c2"),   // outside 60s -> dropped
        (3L, ts("2024-01-01 00:00:10"), "c3"))   // no impression -> dropped
      q.processAllAvailable()
      val got = spark.table(qname).as[(String, String)].collect().toSet
      assert(got === Set(("i1", "c1")))

      // batch twin: identical pairs from a plain interval join
      val bi = Seq((1L, ts("2024-01-01 00:00:00"), "i1"),
        (2L, ts("2024-01-01 00:00:00"), "i2")).toDF("user_id", "ts", "id")
      val bc = Seq((1L, ts("2024-01-01 00:00:30"), "c1"),
        (1L, ts("2024-01-01 00:02:00"), "c2"),
        (3L, ts("2024-01-01 00:00:10"), "c3")).toDF("user_id", "ts", "id")
      val batch = bi.as("l").join(bc.as("r"),
          col("l.user_id") === col("r.user_id") &&
            col("r.ts") >= col("l.ts") &&
            col("r.ts") <= col("l.ts") + expr("INTERVAL 60 SECOND"))
        .select(col("l.id"), col("r.id"))
        .as[(String, String)].collect().toSet
      assert(batch === got)
    } finally q.stop()
  }
}
