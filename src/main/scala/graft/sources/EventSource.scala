package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source substitutability — the architectural spine of the ingestion
  * tier (SURVEY.md §7.1). The reference is a Kafka→HDFS bridge
  * [SURVEY.md §2 Tier A, reconstructed]; this engine expresses the
  * same lifecycle over interchangeable sources so every downstream
  * plan (decode → window → sink) is written once and runs against
  * kafka / file-stream / memory / batch without change.
  *
  * The Kafka binding is config-gated by connector availability: the
  * `spark-sql-kafka-0-10` DataSource is resolved at RUNTIME by name,
  * so this module compiles with no Kafka dependency (SURVEY.md §7.4).
  */
trait EventSource {
  /** Unbounded (streaming) or bounded (batch) events DataFrame with
    * the canonical schema (event_id, ts, user_id, event_type, value,
    * props). */
  def load(spark: SparkSession, sfDir: String): DataFrame
  def isStreaming: Boolean
}

object EventSource {

  /** Batch parquet twin (the oracle-checked path). */
  object BatchParquet extends EventSource {
    def load(spark: SparkSession, sfDir: String): DataFrame =
      Tables(spark, sfDir, "events")
    def isStreaming = false
  }

  /** File-stream over a staged parquet dir — the offline stand-in for
    * the Kafka source (A1/A4): same downstream plan, same
    * checkpoint/offset semantics, `maxFilesPerTrigger` standing in for
    * `maxOffsetsPerTrigger` (A9). */
  object FileStream extends EventSource {
    def load(spark: SparkSession, sfDir: String): DataFrame = {
      val staged = stageEvents(spark, sfDir)
      spark.readStream
        .schema(BatchParquet.load(spark, sfDir).schema)
        .parquet(staged)
    }
    def isStreaming = true
  }

  /** Kafka binding (A1–A5): resolved by name at runtime; available
    * only when the connector jar is on the classpath. */
  object Kafka extends EventSource {
    val providerClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

    /** Availability of an arbitrary provider class — parameterized so
      * BOTH binding branches are testable in one JVM (the real
      * connector is absent offline; see SURVEY.md §0.1). */
    def availableFor(cls: String): Boolean =
      try { Class.forName(cls); true }
      catch { case _: ClassNotFoundException => false }

    def available: Boolean = availableFor(providerClass)

    /** Binding status row backing s_ingest_kafka. */
    def bindingStatus(cls: String = providerClass): (String, Boolean, String) =
      (cls, availableFor(cls),
        if (availableFor(cls)) "bound"
        else "connector-absent:file-stream-twin-active")

    /** Source option map (A1/A3/A9): broker list, subscription,
      * offset-reset position, loss tolerance, per-trigger fetch cap.
      * Pure function — unit-tested without the connector jar. */
    def sourceOptions(brokers: String, topic: String,
        startingOffsets: String = "earliest",
        failOnDataLoss: Boolean = false,
        maxOffsetsPerTrigger: Long = 100000L): Map[String, String] = Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      // the reference tolerated expired offsets by resetting [R]; the
      // Structured Streaming twin is failOnDataLoss=false (A3)
      "failOnDataLoss" -> failOnDataLoss.toString,
      "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)

    /** Per-partition startingOffsets JSON (A3 precise resume):
      * `{"topic":{"0":23,"1":-2}}`; -2 = earliest, -1 = latest.
      * Partitions emitted in numeric order for a stable string. */
    def offsetsJson(topic: String, partitionOffsets: Map[Int, Long]): String =
      partitionOffsets.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p":$o""" }
        .mkString(s"""{"$topic":{""", ",", "}}")

    /** Raw kafka frame (key/value/topic/partition/offset/timestamp);
      * decode to the canonical schema via [[decodeJson]]. */
    def load(spark: SparkSession, sfDir: String): DataFrame = {
      val brokers = sys.env.getOrElse("GRAFT_KAFKA_BROKERS", "localhost:9092")
      val topic = sys.env.getOrElse("GRAFT_KAFKA_TOPIC", "events")
      loadWith(spark, sourceOptions(brokers, topic))
    }

    /** [[load]] with an explicit option map — the A3/A4/A9 paths
      * (per-partition offset resume, loss tolerance, fetch caps) are
      * driven by callers building the map via [[sourceOptions]] /
      * [[offsetsJson]]. */
    def loadWith(spark: SparkSession, options: Map[String, String]): DataFrame = {
      require(available, s"Kafka connector not on classpath ($providerClass)")
      val reader = spark.readStream.format("kafka")
      options.foreach { case (k, v) => reader.option(k, v) }
      decodeJson(spark, reader.load())
    }
    def isStreaming = true

    /** A6: payload bytes → typed columns via the payload-type registry
      * ([[SchemaRegistry]]); malformed payloads decode to null fields
      * here (quarantine variant available via the registry). */
    def decodeJson(spark: SparkSession, raw: DataFrame): DataFrame =
      SchemaRegistry.decode(raw, "events", quarantine = false)
  }

  /** Stage the events fixture as a plain parquet DIR (the file-stream
    * source lists directories; the fixture is a single file). One
    * deterministic location per sfDir, mtime-invalidated ([[Stage]]). */
  def stageEvents(spark: SparkSession, sfDir: String): String =
    Stage.once(sfDir, "events", "events") { staged =>
      BatchParquet.load(spark, sfDir)
        .repartition(4)
        .write.mode("overwrite").parquet(staged)
    }
}
