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

  // --- Avro branch -------------------------------------------------------
  //
  // The Kafka lineage's other wire format. spark-avro (from_avro/
  // to_avro) is not on this box, but avro-1.12.1 is, so the codec runs
  // as typed mapPartitions with per-partition DatumReader/Writer —
  // exactly the shape a per-partition codec wants anyway (parse the
  // schema and allocate the reader once per task, not per row). Narrow
  // map stages, no shuffle; quarantine semantics mirror [[decode]].

  /** Avro record schema (JSON) for a registered payload type. Fields
    * are nullable unions; timestamps are timestamp-micros (Spark's
    * internal resolution — lossless round trip). */
  def avroSchemaJson(payloadType: String): String = {
    import org.apache.spark.sql.types._
    val fields = schemaOf(payloadType).fields.map { f =>
      val t = f.dataType match {
        case LongType => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType => "\"double\""
        case StringType => "\"string\""
        case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
        case other => throw new IllegalArgumentException(
          s"no avro mapping for field '${f.name}': $other")
      }
      s"""{"name":"${f.name}","type":["null",$t],"default":null}"""
    }
    s"""{"type":"record","name":"$payloadType","namespace":"graft",""" +
      s""""fields":[${fields.mkString(",")}]}"""
  }

  private def tsToMicros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
  }

  private def microsToTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Row → GenericRecord under the payload's Avro schema — shared by
    * the binary-frame encoder and the container-file sink. `fields`
    * must be ordered like the row's columns. */
  def toAvroRecord(schema: org.apache.avro.Schema,
      fields: Array[org.apache.spark.sql.types.StructField],
      row: org.apache.spark.sql.Row): org.apache.avro.generic.GenericData.Record = {
    import org.apache.spark.sql.types._
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    var i = 0
    while (i < fields.length) {
      val v =
        if (row.isNullAt(i)) null
        else fields(i).dataType match {
          case TimestampType => Long.box(tsToMicros(row.getTimestamp(i)))
          case StringType => row.getString(i)
          case _ => row.get(i).asInstanceOf[AnyRef]
        }
      rec.put(fields(i).name, v)
      i += 1
    }
    rec
  }

  /** GenericRecord → Spark row values in `fields` order — the decode
    * twin of [[toAvroRecord]]. */
  def fromAvroRecord(fields: Array[org.apache.spark.sql.types.StructField],
      rec: org.apache.avro.generic.GenericRecord): Array[Any] = {
    import org.apache.spark.sql.types._
    fields.map { f =>
      val v = rec.get(f.name)
      if (v == null) null
      else f.dataType match {
        case TimestampType => microsToTs(v.asInstanceOf[Long])
        case StringType => v.toString
        case _ => v
      }
    }
  }

  /** Encode typed columns to a BINARY Avro value column — the Avro
    * twin of [[encode]]. */
  def encodeAvro(df: DataFrame, payloadType: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val base = schemaOf(payloadType)
    val json = avroSchemaJson(payloadType)
    val fields = cols.map(c => base.fields(base.fieldIndex(c))).toArray
    val out = StructType(Seq(StructField("value", BinaryType, nullable = false)))
    df.select(cols.map(col): _*).mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(json)
      val writer = new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema)
      val baos = new java.io.ByteArrayOutputStream()
      var enc: org.apache.avro.io.BinaryEncoder = null
      it.map { row =>
        baos.reset()
        enc = org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, enc)
        writer.write(toAvroRecord(schema, fields, row), enc)
        enc.flush()
        Row(baos.toByteArray)
      }
    }(Encoders.row(out))
  }

  /** Decode a binary Avro value column into the registered typed
    * columns — the Avro twin of [[decode]]. Undecodable payloads
    * quarantine their bytes as base64 in [[corruptCol]] (typed fields
    * null) instead of failing the job. */
  def decodeAvro(raw: DataFrame, payloadType: String,
      valueCol: String = "value", quarantine: Boolean = true,
      keep: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val base = schemaOf(payloadType)
    val json = avroSchemaJson(payloadType)
    val keepFields = keep.map(c => raw.schema.fields(raw.schema.fieldIndex(c)))
    val out = StructType(keepFields ++ base.fields ++
      (if (quarantine) Seq(StructField(corruptCol, StringType)) else Nil))
    val nKeep = keep.size
    val fields = base.fields
    raw.select((keep :+ valueCol).map(col): _*).mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(json)
      val reader = new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](schema)
      var dec: org.apache.avro.io.BinaryDecoder = null
      it.map { row =>
        val keepVals = (0 until nKeep).map(row.get)
        val bytes = row.getAs[Array[Byte]](nKeep)
        val decoded =
          try {
            dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, dec)
            Some(fromAvroRecord(fields, reader.read(null, dec)))
          } catch { case scala.util.control.NonFatal(_) => None }
        decoded match {
          case Some(vals) =>
            Row.fromSeq(keepVals ++ vals ++ (if (quarantine) Seq(null) else Nil))
          case None =>
            Row.fromSeq(keepVals ++ fields.map(_ => null) ++
              (if (quarantine)
                Seq(java.util.Base64.getEncoder.encodeToString(bytes)) else Nil))
        }
      }
    }(Encoders.row(out))
  }
}
