package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** A6 generalized — payload-type → schema registry for the decode edge
  * (SURVEY.md §2 A6). The reference decoded one payload shape at the
  * mapper [R: `new String(bytes)`]; a multi-topic deployment needs a
  * registry: the topic/payload name selects the value schema, decode is
  * schema-on-read (`from_json`), and malformed payloads are QUARANTINED
  * into a `_corrupt_record` column instead of failing the stream —
  * at 100 TB a poison message must never kill ingestion.
  *
  * Registration is process-wide and additive (a deployment registers
  * its topics at boot); the two fixture shapes ship pre-registered.
  */
object SchemaRegistry {

  val corruptCol = "_corrupt_record"

  /** Timestamps carry µs precision end-to-end (Spark's internal
    * resolution; the events fixture has live µs components). ENCODE
    * pins the 6-digit fraction format — the default ms-precision JSON
    * write format would silently truncate. DECODE deliberately sets NO
    * timestampFormat: a pinned `SSSSSS` pattern is strict about digit
    * count and would reject well-formed payloads with shorter
    * fractions, while Spark's default parse path accepts any ISO-8601
    * fraction length losslessly (both cases covered in RegistrySpec). */
  val encodeOptions: Map[String, String] = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")

  val decodeOptions: Map[String, String] = Map("mode" -> "PERMISSIVE")

  private val schemas =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  def register(payloadType: String, ddl: String): Unit =
    schemas.put(payloadType, StructType.fromDDL(ddl))

  register("events",
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING")
  register("documents",
    "doc_id BIGINT, lang STRING, text STRING, n_chars INT")

  def schemaOf(payloadType: String): StructType = {
    val s = schemas.get(payloadType)
    require(s != null, s"unregistered payload type '$payloadType'; " +
      s"known: ${known.mkString(", ")}")
    s
  }

  def known: Seq[String] = {
    import scala.jdk.CollectionConverters._
    schemas.keySet().asScala.toSeq.sorted
  }

  /** Decode a raw value column (binary or string, the Kafka frame
    * shape) into the registered typed columns. With `quarantine`,
    * malformed payloads keep their raw text in [[corruptCol]] (typed
    * fields null) so callers can route them to a dead-letter sink;
    * without, malformed rows decode to all-null fields (r1's A6
    * behavior). `keep` carries source metadata columns (offset,
    * partition, topic …) through the decode. Narrow projection — no
    * shuffle, codegen-friendly. */
  def decode(raw: DataFrame, payloadType: String,
      valueCol: String = "value", quarantine: Boolean = true,
      keep: Seq[String] = Nil): DataFrame = {
    val base = schemaOf(payloadType)
    val schema = if (quarantine) base.add(corruptCol, StringType) else base
    val opts = decodeOptions + ("columnNameOfCorruptRecord" -> corruptCol)
    raw.withColumn("__graft_decoded",
        from_json(col(valueCol).cast("string"), schema, opts))
      .select(keep.map(col) :+ col("__graft_decoded.*"): _*)
  }

  /** Encode typed columns to a JSON value column with the registry's
    * lossless options — the test/round-trip twin of [[decode]]. */
  def encode(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(to_json(struct(cols.map(col): _*), encodeOptions).as("value"))
}
