package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.{SchemaRegistry, Tables}

/** A6 (decode edge) as an oracle-checked operator: the full
  * encode→registry-decode round trip over the events table. The oracle
  * is the PLAIN projection of the same columns — a decode that loses or
  * mangles anything (µs timestamp fractions, JSON-escaped props
  * strings, double formatting) hash-mismatches immediately.
  *
  * 100 TB posture: decode is a narrow per-row projection (from_json
  * inside whole-stage codegen), no shuffle; malformed payloads
  * quarantine into `_corrupt_record` rather than failing the job. */
object Decode {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_decode_registry" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val encoded = SchemaRegistry.encode(e, cols)
      val decoded = SchemaRegistry.decode(encoded, "events")
      ordered(decoded
        .filter(col(SchemaRegistry.corruptCol).isNull)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props")))
    },
    "q_decode_avro" -> { (s, dir) =>
      // The Avro wire-format twin of q_decode_registry: encode the
      // events table to binary Avro frames (timestamp-micros logical
      // type, nullable unions), decode through the registry's
      // per-partition DatumReader, and project against the SAME plain
      // oracle — any loss in the binary codec (timestamp precision,
      // double bits, string escaping) hash-mismatches. Both codec
      // stages are narrow mapPartitions (schema parsed and reader
      // allocated once per task), no shuffle.
      val e = Tables(s, dir, "events")
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
      val encoded = SchemaRegistry.encodeAvro(e, "events", cols)
      val decoded = SchemaRegistry.decodeAvro(encoded, "events")
      ordered(decoded
        .filter(col(SchemaRegistry.corruptCol).isNull)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props")))
    }
  )

  private val plainEventsOracle =
    """SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
      |  user_id, event_type, value, props
      |FROM events""".stripMargin +
      orderByAll("event_id", "ts_us", "user_id", "event_type", "value", "props")

  def oracle: Map[String, String] = Map(
    "q_decode_registry" -> plainEventsOracle,
    "q_decode_avro" -> plainEventsOracle
  )
}
