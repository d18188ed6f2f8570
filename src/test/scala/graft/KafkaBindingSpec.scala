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
