package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{EventSource, SchemaRegistry, Tables}
import org.apache.spark.sql.kafka010.KafkaSourceProvider

/** End-to-end exercise of the A1–A5 Kafka binding through the
  * test-classpath fake connector (SURVEY.md §0.1: the real jar is
  * absent offline): `EventSource.Kafka.load` resolves `format("kafka")`
  * for real, ships its full option map to the source, streams the
  * fixed Kafka frame, and registry-decodes it to the canonical events
  * schema — asserted row-exact against the batch table. */
class KafkaBindingSpec extends SparkSpec {

  test("availability gate sees the connector class (bound branch for real)") {
    assert(EventSource.Kafka.available,
      "fake connector missing from the test classpath")
    val (cls, avail, status) = EventSource.Kafka.bindingStatus()
    assert(cls === "org.apache.spark.sql.kafka010.KafkaSourceProvider")
    assert(avail && status === "bound")
    // the absent branch stays covered: an unresolvable class reports
    // the file-stream-twin fallback
    val (_, absent, fallback) = EventSource.Kafka.bindingStatus("no.such.Connector")
    assert(!absent && fallback.startsWith("connector-absent"))
  }

  /** Stage n contiguous-offset records `base..base+n-1` whose payload
    * carries the offset as event_id. */
  private def stageLog(base: Long, n: Int): Unit =
    KafkaSourceProvider.feed = (0 until n).map { i =>
      val off = base + i
      val payload =
        s"""{"event_id": $off, "ts": "2024-01-01T10:00:00.000001Z", """ +
          s""""user_id": 1, "event_type": "e", "value": 1.5, "props": "{}"}"""
      KafkaSourceProvider.Rec(off, off.toString.getBytes("UTF-8"),
        payload.getBytes("UTF-8"), 1704103200000001L)
    }.toArray

  private def runToEnd(stream: org.apache.spark.sql.DataFrame,
      out: String, ck: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  private def gotIds(out: String): Seq[Long] =
    spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("per-partition startingOffsets JSON resumes mid-log (A3 precise resume)") {
    stageLog(0, 20)
    val opts = EventSource.Kafka.sourceOptions("b:9092", "events",
      startingOffsets = EventSource.Kafka.offsetsJson("events", Map(0 -> 12L)))
    val out = tmp("k_resume_out")
    runToEnd(EventSource.Kafka.loadWith(spark, opts), out, tmp("k_resume_ck"))
    assert(gotIds(out) === (12L until 20L).toSeq,
      "stream must start exactly at the requested per-partition offset")
  }

  test("out-of-range start: failOnDataLoss=true fails, false resets to earliest (A3)") {
    // retained log starts at offset 50; a checkpoint-era offset 10 has
    // been expired from the broker
    stageLog(50, 10)
    val ask10 = EventSource.Kafka.offsetsJson("events", Map(0 -> 10L))
    val strict = EventSource.Kafka.sourceOptions("b:9092", "events",
      startingOffsets = ask10, failOnDataLoss = true)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runToEnd(EventSource.Kafka.loadWith(spark, strict), tmp("k_oor_out"), tmp("k_oor_ck"))
    }
    assert(ex.getMessage.contains("Offsets out of range") ||
      String.valueOf(ex.getCause).contains("Offsets out of range"), ex.getMessage)
    // tolerant branch: reset to earliest retained, deliver the full log
    val tolerant = EventSource.Kafka.sourceOptions("b:9092", "events",
      startingOffsets = ask10, failOnDataLoss = false)
    val out = tmp("k_oor2_out")
    runToEnd(EventSource.Kafka.loadWith(spark, tolerant), out, tmp("k_oor2_ck"))
    assert(gotIds(out) === (50L until 60L).toSeq)
  }

  test("maxOffsetsPerTrigger caps every micro-batch; AvailableNow drains in capped batches (A9)") {
    stageLog(0, 20)
    val opts = EventSource.Kafka.sourceOptions("b:9092", "events",
      maxOffsetsPerTrigger = 7L)
    val out = tmp("k_cap_out")
    val q = runToEnd(EventSource.Kafka.loadWith(spark, opts), out, tmp("k_cap_ck"))
    assert(gotIds(out) === (0L until 20L).toSeq)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.forall(_ <= 7), s"a batch exceeded the cap: ${sizes.mkString(",")}")
    assert(sizes.length === 3, s"expected ceil(20/7)=3 capped batches, got ${sizes.mkString(",")}")
  }

  test("checkpointed re-run ingests only records appended after the first run (A4/A5)") {
    stageLog(0, 10)
    val opts = EventSource.Kafka.sourceOptions("b:9092", "events")
    val out = tmp("k_ck_out"); val ck = tmp("k_ck_ck")
    runToEnd(EventSource.Kafka.loadWith(spark, opts), out, ck)
    assert(gotIds(out) === (0L until 10L).toSeq)
    // broker moves on; the same checkpoint must resume past the commit
    stageLog(0, 15)
    runToEnd(EventSource.Kafka.loadWith(spark, opts), out, ck)
    assert(gotIds(out) === (0L until 15L).toSeq,
      "re-run must append exactly the new records — no loss, no dups")
  }

  test("Kafka.load streams the frame end-to-end and decodes to the batch rows") {
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val batch = Tables(spark, sf, "events").filter(col("user_id") < 30)
    // stage the broker log: offset = event_id (the replayable log
    // position), value = registry-encoded JSON payload, key = id bytes
    KafkaSourceProvider.feed = batch
      .select(col("event_id"),
        to_json(struct(cols.map(col): _*), SchemaRegistry.encodeOptions).as("payload"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => KafkaSourceProvider.Rec(r.getLong(0),
        r.getLong(0).toString.getBytes("UTF-8"),
        r.getString(1).getBytes("UTF-8"), r.getLong(2)))
    val out = java.nio.file.Files.createTempDirectory("fake_kafka_out").toString
    val ck = java.nio.file.Files.createTempDirectory("fake_kafka_ck").toString
    val stream = EventSource.Kafka.load(spark, sf)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the engine passed the A1/A3/A9 option surface to the source
    val opts = KafkaSourceProvider.receivedOptions
    assert(opts("subscribe") === "events")
    assert(opts("startingOffsets") === "earliest")
    assert(opts("failOnDataLoss") === "false")
    assert(opts("maxOffsetsPerTrigger") === "100000")
    // decode loses nothing: row-exact vs the batch table
    val back = spark.read.parquet(out).select(cols.map(col): _*)
    val want = batch.select(cols.map(col): _*)
    assert(back.count() === want.count())
    assert(back.exceptAll(want).count() === 0, "streamed rows not in batch table")
    assert(want.exceptAll(back).count() === 0, "batch rows lost in kafka path")
  }
}
