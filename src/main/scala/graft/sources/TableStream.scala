package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Streaming SOURCE over the [[CommitLog]] table — the read-side weld
  * between the streaming tier and the table layer (the public Delta
  * streaming-source design; s_table_stream_commit is the write-side
  * twin). The commit log's version numbers ARE the offset space:
  * micro-batch (start, end] delivers the data files that JOINED the
  * listing at each version in the range, so a consumer reads each
  * appended row exactly once, checkpoints restart at the exact
  * version boundary, and backfill-then-tail is one unchanged query.
  *
  * Commit-kind semantics mirror the public source's:
  *   - "append" versions emit their added files;
  *   - data-neutral rewrites ("compact"/"optimize") are SKIPPED — a
  *     file-level diff across them would re-emit unchanged rows;
  *   - data-CHANGING rewrites ("delete"/"merge") FAIL the stream with
  *     a clear error unless `ignoreChanges=true`, which emits the
  *     version's added files accepting the documented re-emission of
  *     carried rows in rewritten files (exactly Delta's
  *     ignoreChanges contract).
  *
  * Schema comes from the LOG when the table is schema-evolved (no
  * footer reads), else from the head snapshot. The per-file
  * PartitionReader decodes parquet through the parquet-hadoop Group
  * API and supports flat primitive schemas (long/int/double/float/
  * string/boolean/timestamp-µs) — the fixture tables' shape; nested
  * columns would need the vectorized reader and fail fast with a
  * clear error instead of mis-decoding.
  *
  * 100 TB posture: planning is pure log metadata (version manifests
  * diffed — never a directory listing); one input partition per added
  * file gives full read parallelism; a micro-batch's volume is the
  * delta, never the table.
  *
  * Usage: `spark.readStream.format("graft-table").option("path", root)
  * .load()` (registered via META-INF/services and short name). */
class TableStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-table needs option(\"path\", <table root>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    val head = CommitLog.latestVersion(root).getOrElse(
      throw new IllegalArgumentException(s"graft-table: no commit log under $root"))
    CommitLog.snapshotSchemaOf(root, head)
      .getOrElse(CommitLog.read(SparkSession.active, root, head).schema)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftStreamTable(schema, properties.get("path"))
}

class GraftStreamTable(tableSchema: StructType, root: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-table($root)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val ignoreChanges =
      Option(options.get("ignoreChanges")).exists(_.toBoolean)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new TableMicroBatchStream(root, tableSchema, ignoreChanges)
      }
    }
  }
}

/** Offset = last fully-delivered VERSION (-1 = nothing yet). */
case class TableVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

class TableMicroBatchStream(root: String, schema: StructType,
    ignoreChanges: Boolean)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def head: Long = CommitLog.latestVersion(root).getOrElse(-1L)

  // AvailableNow snapshots the head so the drain has a fixed end even
  // if writers keep committing during the run
  @volatile private var availableNowEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(head)

  override def initialOffset(): Offset = TableVersionOffset(-1L)
  override def latestOffset(): Offset =
    TableVersionOffset(availableNowEnd.getOrElse(head))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): the
  // source admits whole VERSIONS — one commit is the natural batch
  // granule, so rate limits are not sliced below it
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    TableVersionOffset(availableNowEnd.getOrElse(head))
  override def deserializeOffset(json: String): Offset =
    TableVersionOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TableVersionOffset].v
    val e = end.asInstanceOf[TableVersionOffset].v
    ((s + 1) to e).flatMap { v =>
      val added = CommitLog.snapshotOp(root, v) match {
        case "append" => addedFiles(v)
        case "compact" | "optimize" => Nil // data-neutral rewrite: skip
        case changing =>
          if (ignoreChanges) addedFiles(v)
          else throw new IllegalStateException(
            s"graft-table: version $v is a '$changing' commit — a file " +
              "diff across a data-changing rewrite re-emits carried " +
              "rows; set ignoreChanges=true to accept that (the public " +
              "sources' contract) or start past it")
      }
      added.map(f => TableFilePartition(f, v))
    }.toArray
  }

  private def addedFiles(v: Long): Seq[String] = {
    val before =
      if (v == 0) Set.empty[String] else CommitLog.snapshotFiles(root, v - 1).toSet
    CommitLog.snapshotFiles(root, v).filterNot(before)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TableFileReaderFactory(schema)
}

case class TableFilePartition(path: String, version: Long) extends InputPartition

class TableFileReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TableFilePartition]
    new GroupParquetReader(p.path, schema)
  }
}

/** Row-by-row parquet decode via the parquet-hadoop Group API — flat
  * primitive schemas only (nested types fail fast). The column lookup
  * is BY NAME against each file's own schema, so pre-evolution files
  * (missing an added column) project nulls exactly like the batch
  * reader under the log schema. */
class GroupParquetReader(path: String, schema: StructType)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.hadoop.ParquetReader
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.example.data.Group

  schema.fields.foreach { f =>
    require(f.dataType match {
      case LongType | IntegerType | DoubleType | FloatType | StringType |
           BooleanType | TimestampType | TimestampNTZType => true
      case _ => false
    }, s"graft-table reader supports flat primitive columns; '${f.name}' is ${f.dataType}")
  }

  private val reader: ParquetReader[Group] = ParquetReader
    .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(path))
    .build()
  private var current: Group = _

  override def next(): Boolean = { current = reader.read(); current != null }

  override def get(): InternalRow = {
    val g = current
    val fileType = g.getType
    new GenericInternalRow(schema.fields.map { f =>
      val idx = if (fileType.containsField(f.name)) fileType.getFieldIndex(f.name) else -1
      if (idx < 0 || g.getFieldRepetitionCount(idx) == 0) null
      else f.dataType match {
        case LongType => g.getLong(idx, 0)
        case IntegerType => g.getInteger(idx, 0)
        case DoubleType => g.getDouble(idx, 0)
        case FloatType => g.getFloat(idx, 0)
        case BooleanType => g.getBoolean(idx, 0)
        case StringType => UTF8String.fromString(g.getString(idx, 0))
        // Spark writes timestamps as INT64 micros; InternalRow wants µs
        case TimestampType | TimestampNTZType => g.getLong(idx, 0)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }.toArray[Any])
  }

  override def close(): Unit = reader.close()
}
