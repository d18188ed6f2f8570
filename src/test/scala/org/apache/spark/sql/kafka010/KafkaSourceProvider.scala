package org.apache.spark.sql.kafka010

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** TEST-ONLY fake of the Kafka connector (SURVEY.md §0.1: no
  * `spark-sql-kafka-0-10` jar exists offline). Registered under the
  * connector's exact class name and `kafka` short name on the TEST
  * classpath only, so BOTH halves of `EventSource.Kafka`'s
  * availability gate — the `Class.forName` check and the
  * `format("kafka")` resolution — run for real in the suite, and
  * `EventSource.Kafka.load`'s full option-wiring + frame-decode path
  * executes end-to-end against deterministic staged records.
  *
  * A DataSource V2 `TableProvider` + `MicroBatchStream` serving the
  * fixed Kafka frame schema (key/value/topic/partition/offset/
  * timestamp/timestampType) from a test-staged record array; the
  * `subscribe` topic and every other option the engine passes are
  * captured for assertion. */
object KafkaSourceProvider {
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** One staged record: (offset, key bytes, value bytes, event-time µs). */
  final case class Rec(offset: Long, key: Array[Byte], value: Array[Byte],
      tsMicros: Long)

  /** The broker log stand-in, staged by the spec before `load`. */
  @volatile var feed: Array[Rec] = Array.empty
  /** Options the engine actually passed to the source — asserted by
    * the spec against `EventSource.Kafka.sourceOptions`. */
  @volatile var receivedOptions: Map[String, String] = Map.empty
}

class KafkaSourceProvider extends TableProvider with DataSourceRegister {
  import KafkaSourceProvider._
  override def shortName(): String = "kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    kafkaSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new FakeKafkaTable
}

class FakeKafkaTable extends Table with SupportsRead {
  import KafkaSourceProvider._
  override def name(): String = "fake-kafka"
  override def schema(): StructType = kafkaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    import scala.jdk.CollectionConverters._
    receivedOptions = options.asCaseSensitiveMap().asScala.toMap
    new ScanBuilder {
      override def build(): Scan = new FakeKafkaScan
    }
  }
}

class FakeKafkaScan extends Scan {
  import KafkaSourceProvider._
  override def readSchema(): StructType = kafkaSchema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FakeKafkaMicroBatchStream
}

case class FakeKafkaOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Offsets are LOG offsets (`Rec.offset`), not array indices, so the
  * A3 paths are real: `startingOffsets` (earliest/latest/per-partition
  * JSON with -2/-1 sentinels) picks the initial position, a request
  * below the retained log start either fails (`failOnDataLoss=true`)
  * or resets to earliest, and `maxOffsetsPerTrigger` caps each
  * micro-batch through genuine `SupportsAdmissionControl` admission
  * (the AvailableNow wrapper drains the log in capped batches). */
class FakeKafkaMicroBatchStream extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  import KafkaSourceProvider._
  private def opt(k: String): Option[String] =
    receivedOptions.collectFirst { case (key, v) if key.equalsIgnoreCase(k) => v }
  private def logStart: Long = if (feed.isEmpty) 0L else feed.map(_.offset).min
  private def logEnd: Long = if (feed.isEmpty) 0L else feed.map(_.offset).max + 1

  // Like the real connector, the source implements
  // SupportsTriggerAvailableNow ITSELF: the generic AvailableNow
  // wrapper snapshots the end offset with ReadLimit.allAvailable and
  // never re-applies the per-trigger cap, so a wrapped source would
  // drain in one uncapped batch.
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(logEnd)

  override def initialOffset(): Offset = {
    val requested = opt("startingOffsets").getOrElse("earliest") match {
      case "earliest" => logStart
      case "latest" => logEnd
      case json => // per-partition JSON; the fake serves one partition (0)
        """"0"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json)
          .map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(
            s"fake kafka: no partition 0 entry in startingOffsets $json")) match {
          case -2L => logStart
          case -1L => logEnd
          case n => n
        }
    }
    if (requested < logStart) {
      // the real connector's out-of-range semantics (A3): expired
      // offsets fail the query unless loss is tolerated, in which
      // case the source resets to the earliest retained offset
      if (opt("failOnDataLoss").forall(_.toBoolean))
        throw new IllegalStateException(
          s"Offsets out of range: requested $requested but log starts at " +
            s"$logStart; set failOnDataLoss=false to reset to earliest")
      FakeKafkaOffset(logStart)
    } else FakeKafkaOffset(requested)
  }

  override def getDefaultReadLimit: ReadLimit =
    opt("maxOffsetsPerTrigger").map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): Offset = FakeKafkaOffset(logEnd)
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    val end = availableNowEnd.getOrElse(logEnd)
    val capped = limit match {
      case rl: ReadMaxRows =>
        // offsets may be sparse: admit maxRows RECORDS, not positions
        val admitted = feed.map(_.offset).filter(o => o >= s && o < end)
          .sorted.take(rl.maxRows().toInt)
        if (admitted.isEmpty) math.max(s, end) else admitted.last + 1
      case _ => end
    }
    FakeKafkaOffset(math.min(capped, end))
  }

  override def deserializeOffset(json: String): Offset =
    FakeKafkaOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[FakeKafkaOffset].n
    val e = end.asInstanceOf[FakeKafkaOffset].n
    val topic = opt("subscribe").getOrElse("events")
    Array(FakeKafkaPartition(
      feed.filter(r => r.offset >= s && r.offset < e), topic))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FakeKafkaReaderFactory
}

case class FakeKafkaPartition(recs: Array[KafkaSourceProvider.Rec],
    topic: String) extends InputPartition

class FakeKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FakeKafkaPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.recs.length }
      override def get(): InternalRow = {
        val r = p.recs(i)
        new GenericInternalRow(Array[Any](
          r.key, r.value, UTF8String.fromString(p.topic),
          0, r.offset, r.tsMicros, 0))
      }
      override def close(): Unit = ()
    }
  }
}
