package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B1 scans + B2 projection/filter (SURVEY.md §2).
  *
  * Scale notes: all predicates/projections here are Catalyst-pushable —
  * the parquet scan must show PushedFilters + pruned ReadSchema (plan
  * asserted in ScanSpec); at 100 TB these are the difference between
  * reading 3 columns and reading 16. */
object Scans {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> { (s, dir) =>
      ordered(Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")))
    },
    "q_scan_filter_pushdown" -> { (s, dir) =>
      ordered(Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity")))
    },
    "q_scan_union_files" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_name").as("name"), lit("customer").as("src"))
      val sup = Tables(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_name").as("name"), lit("supplier").as("src"))
      ordered(c.unionByName(sup))
    },
    "q_project_expr" -> { (s, dir) =>
      // Row-level double arithmetic is IEEE-identical across engines;
      // no decimal needed (only aggregation order is engine-dependent).
      ordered(Tables(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        (col("l_quantity") * col("l_extendedprice")).as("gross")))
    },
    "q_filter_compound" -> { (s, dir) =>
      ordered(Tables(s, dir, "orders")
        .filter(
          (col("o_orderstatus") === "F" || col("o_orderstatus") === "P") &&
          col("o_totalprice").between(50000.0, 200000.0) &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          !(col("o_orderkey") % 7 === 0))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority")))
    },
    "q_scan_json" -> { (s, dir) =>
      // JSON-lines source (the ingestion edge's wire format): the
      // events table staged (mtime-invalidated) as registry-encoded JSON,
      // scanned back with an EXPLICIT schema (schema inference at
      // 100 TB means a full extra pass — never rely on it), projected
      // with the predicate pushed to the reader.
      val staged = stageEventsJson(s, dir)
      val e = s.read
        .schema(graft.sources.SchemaRegistry.schemaOf("events"))
        .options(graft.sources.SchemaRegistry.encodeOptions)
        .json(staged)
      ordered(e.filter(col("user_id") < lit(100L))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value")))
    },
    "q_scan_avro" -> { (s, dir) =>
      // Avro container-file scan — reading back the classic Kafka→HDFS
      // landing layout (s_sink_avro writes it). The RDD bridge
      // (avro-mapred; spark-avro absent offline) has no predicate
      // pushdown: container blocks are splittable so the scan
      // parallelizes, but every record deserializes before the filter
      // — which is WHY a 100 TB deployment lands Avro and converts to
      // parquet for analytics (this engine's s_compact_files /
      // parquet sinks); the scan exists so the landing format is
      // queryable without that hop.
      val staged = stageEventsAvro(s, dir)
      import org.apache.avro.generic.GenericRecord
      import org.apache.avro.mapred.AvroKey
      import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat}
      import org.apache.hadoop.io.NullWritable
      val base = graft.sources.SchemaRegistry.schemaOf("events")
      val json = graft.sources.SchemaRegistry.avroSchemaJson("events")
      val rjob = org.apache.hadoop.mapreduce.Job.getInstance(
        s.sparkContext.hadoopConfiguration)
      AvroJob.setInputKeySchema(rjob, new org.apache.avro.Schema.Parser().parse(json))
      val fieldArr = base.fields
      val rdd = s.sparkContext.newAPIHadoopFile(staged,
          classOf[AvroKeyInputFormat[GenericRecord]],
          classOf[AvroKey[GenericRecord]], classOf[NullWritable],
          rjob.getConfiguration)
        // convert INSIDE the map: Hadoop record readers reuse key objects
        .map { case (k, _) => org.apache.spark.sql.Row.fromSeq(
          graft.sources.SchemaRegistry.fromAvroRecord(fieldArr, k.datum()).toSeq) }
      val e = s.createDataFrame(rdd, base)
      ordered(e.filter(col("user_id") < lit(100L))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value")))
    },
    "q_scan_csv" -> { (s, dir) =>
      // CSV source twin: the customer table staged as headerless CSV
      // (mtime-invalidated), read back with an EXPLICIT schema (inference
      // at 100 TB = a full extra pass) and the filter pushed to the
      // reader. Doubles survive the text round-trip exactly: Spark
      // writes shortest-round-trip representations and the parser
      // returns the identical IEEE value.
      val staged = stageCustomerCsv(s, dir)
      val c = s.read
        .schema("c_custkey LONG, c_name STRING, c_nationkey INT, " +
          "c_acctbal DOUBLE, c_mktsegment STRING")
        .csv(staged)
      ordered(c.filter(col("c_acctbal") > lit(1000.0))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment")))
    },
    "q_scan_text" -> { (s, dir) =>
      // Line-oriented text landing format — the classic consumer dump
      // (one record per line, tab-delimited; the fixture text is
      // tab-free word soup, so the delimiter is total). s_sink_text
      // covers the write side; this key reads the staged lines back,
      // parses with a bounded split + casts (narrow codegen
      // projection), and the parquet-side oracle proves the round trip
      // lossless. 100 TB posture: text is line-splittable, so
      // parallelism = input splits like any columnar scan — what the
      // format costs is pushdown (none; every byte is read and parsed),
      // which is exactly why it's a landing format, not a table format.
      val staged = stageDocumentsText(s, dir)
      val f = split(col("value"), "\t", 3)
      ordered(s.read.text(staged).select(
        f.getItem(0).cast("long").as("doc_id"),
        f.getItem(1).as("lang"),
        f.getItem(2).as("text")))
    },
    "q_scan_xml" -> { (s, dir) =>
      // XML scan via Spark 4's built-in XML source (rowTag extraction;
      // the databricks/spark-xml lineage merged into core in 4.0) —
      // the legacy-feed landing format (SOAP exports, sitemap/feed
      // dumps, config drops). Staging appends a literal `&<>"` tail
      // to every text value BEFORE entity-escaping, so the
      // escape → StAX-unescape round trip provably fires on every row
      // (the fixture text itself is entity-free); the oracle computes
      // md5 over the same suffixed text from parquet, so any fidelity
      // loss (entities, whitespace trim, line-end normalization)
      // hash-mismatches. Explicit schema — no inference pass.
      // 100 TB posture: one rowTag element per line here, but the
      // source must TOKENIZE xml to find record boundaries (no
      // pushdown, no pruning) — same landing-format verdict as
      // q_scan_text/q_scan_avro: queryable where it lands, convert to
      // parquet for analytics.
      val staged = stageDocumentsXml(s, dir)
      val x = s.read.format("xml")
        .option("rowTag", "doc")
        // pinned, not defaulted: the md5 round-trip is a FIDELITY
        // contract — a text value with leading/trailing whitespace must
        // survive verbatim, and the source's default
        // ignoreSurroundingSpaces=true would silently trim it (the
        // fixtures happen to be trim-safe; the contract must not
        // depend on that)
        .option("ignoreSurroundingSpaces", "false")
        .schema("id LONG, lang STRING, text STRING")
        .load(staged)
      ordered(x.select(col("id").as("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars_rt"),
        md5(col("text")).as("text_md5")))
    },
    "q_scan_csv_malformed" -> { (s, dir) =>
      // PERMISSIVE CSV quarantine (added r8) — the landing-format
      // reality the clean q_scan_csv skips: real CSV feeds carry
      // malformed rows, and the ingestion contract is quarantine-
      // don't-crash (the CSV twin of the JSON/Avro registry decode
      // paths). Poison is PLANTED by doc_id rule (every 11th row's
      // numeric column is the unparseable token `oops`), read back
      // with an explicit schema + columnNameOfCorruptRecord, and the
      // report proves (a) nothing was dropped, (b) exactly the
      // planted rows quarantined with their RAW line recoverable,
      // (c) good-row arithmetic is untouched. The oracle recomputes
      // every number from the planting rule — a parser that silently
      // dropped or mis-flagged a row breaks the hash.
      val staged = stageDocumentsCsvPoison(s, dir)
      val r = s.read
        .schema("doc_id LONG, lang STRING, n_chars LONG, _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(staged)
      ordered(r.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_good"),
        sum(when(col("_corrupt").isNull, col("n_chars")).otherwise(0L))
          .cast("long").as("sum_chars_good"),
        sum(when(col("_corrupt").endsWith(",oops"), 1L).otherwise(0L))
          .as("n_corrupt_marked")))
    },
    "q_scan_parquet_bloom" -> { (s, dir) =>
      // Parquet bloom-filter pruning (added r8) — the row-group-skip
      // primitive for NEEDLE-IN-HAYSTACK equality predicates that
      // min/max statistics cannot serve (a high-cardinality key like
      // o_custkey is spread across every row group, so min/max prunes
      // nothing; the per-row-group bloom says "definitely absent" and
      // the reader skips the group without decoding it). Orders are
      // staged sorted-by-custkey-bucket with
      // parquet.bloom.filter.enabled#o_custkey=true, then probed with
      // an IN (...) equality set; PlanSpec pins that the EqualTo
      // pushdown reaches the scan. Semantics are bloom-independent
      // (the filter re-applies exactly) — the feature is pure I/O
      // skipping, which is why a plain DuckDB filter is a valid
      // oracle. At 100 TB this plus q_scan_partition_prune are the
      // two scan-side pruning levers: partition values you organize
      // by, blooms for the keys you cannot.
      val staged = stageOrdersBloom(s, dir)
      val o = s.read.parquet(staged)
      ordered(o.filter(col("o_custkey").isin(11L, 407L, 1013L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus")))
    },
    "q_scan_orc" -> { (s, dir) =>
      // ORC source twin (the other columnar format Spark ships a
      // native vectorized reader for): supplier staged as ORC
      // (mtime-invalidated), read back with predicate + projection
      // pushed to the ORC reader (same PushedFilters/ReadSchema
      // contract as parquet). Doubles/longs round-trip bit-exactly —
      // ORC stores IEEE doubles natively.
      val staged = stageSupplierOrc(s, dir)
      val sup = s.read.orc(staged)
      ordered(sup.filter(col("s_acctbal") > lit(1000.0))
        .select(col("s_suppkey"), col("s_name"),
          col("s_nationkey"), col("s_acctbal")))
    },
    "q_scan_partition_prune" -> { (s, dir) =>
      // Partition-pruned read — THE 100 TB scan primitive: the table
      // laid out hive-style by a low-cardinality column, a predicate on
      // that column resolved against directory METADATA (the file
      // listing), so non-matching partitions are never opened. At
      // 100 TB this is the difference between listing 2/5 of the
      // directories and scanning everything. PlanSpec asserts the
      // predicate lands in PartitionFilters (not PushedFilters) and
      // the data-file ReadSchema no longer carries the column.
      val staged = stageOrdersPartitioned(s, dir)
      val o = s.read.parquet(staged)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      ordered(o.select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority")))
    },
    "q_layout_hilbert" -> { (s, dir) =>
      // Hilbert-curve layout key — the locality-superior sibling of
      // q_layout_zorder: unlike the Z curve, the Hilbert curve has NO
      // long diagonal jumps (every consecutive pair of cells is
      // grid-adjacent — LayoutSpec proves both bijectivity and the
      // adjacency law over the full 256×256 grid), so range buckets
      // bound BOTH dimensions tighter per file and min/max skipping
      // prunes more. The index is the classic xy→d walk (8 unrolled
      // quadrant-rotation rounds, pure integer CASE/mask arithmetic —
      // exact in any engine; the DuckDB twin replays the identical
      // rounds). Same report shape as zorder: per would-be-file
      // bucket, each dimension's bounded span. Narrow map + one hash
      // agg; at 100 TB the hd value is the repartitionByRange key for
      // the actual rewrite.
      val li = Tables(s, dir, "lineitem")
        .withColumn("hx", pmod(col("l_partkey"), lit(256L)))
        .withColumn("hy", pmod(col("l_suppkey"), lit(256L)))
        .withColumn("hd", lit(0L))
      ordered(hilbertIndex(li).groupBy(expr("hd DIV 1024").as("h_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max")))
    },
    "q_layout_zorder" -> { (s, dir) =>
      // Z-order layout key — the multi-dimensional clustering that
      // makes min/max data skipping work on TWO predicate columns at
      // once (Delta/Iceberg OPTIMIZE ZORDER; a single-key sort bounds
      // only its own column per file). Z-value = bit-interleave of the
      // two 16-bit-normalized keys via the public magic-mask dilation
      // identity — pure integer ops, exact in any engine. The report
      // groups rows into z-range buckets (the would-be files) and
      // emits each bucket's min/max of BOTH dims: the bounded spans
      // are precisely the file-level statistics a scan would prune
      // against. Narrow map + one hash agg; at 100 TB the same
      // z-value is the repartitionByRange key for the actual rewrite
      // (s_compact_files is the write-side twin).
      def spread(c0: org.apache.spark.sql.Column) = {
        val a = c0.bitwiseOR(shiftleft(c0, 8)).bitwiseAND(lit(16711935L))
        val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(252645135L))
        val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(858993459L))
        c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(1431655765L))
      }
      val li = Tables(s, dir, "lineitem")
        .withColumn("x", pmod(col("l_partkey"), lit(65536L)))
        .withColumn("y", pmod(col("l_suppkey"), lit(65536L)))
        .withColumn("z", spread(col("x"))
          .bitwiseOR(shiftleft(spread(col("y")), 1)))
      ordered(li.groupBy(expr("z DIV 65536").as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
          min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max")))
    },
    "q_scan_schema_evolution" -> { (s, dir) =>
      // Schema drift across file generations — the first real-world
      // ingestion failure mode after malformed rows: a long-lived sink
      // accretes files written before AND after a column migration.
      // Generation 1 carries status_legacy (later dropped); generation
      // 2 drops it and adds priority_v2. mergeSchema=true unifies the
      // footers (one schema-merge pass over file METADATA, distributed
      // and done once per listing at 100 TB — cheap next to the scan),
      // gen-1 rows surface NULL for the added column and vice versa,
      // and registry-style defaulting fills the added column for
      // pre-migration rows. The report proves no row or value was
      // dropped by the merge: per-generation counts, presence of the
      // dropped column, default fill count, exact price sum.
      val staged = stageOrdersEvolved(s, dir)
      val merged = s.read.option("mergeSchema", "true").parquet(staged)
      val defaulted = merged.withColumn("priority_v2",
        coalesce(col("priority_v2"), lit("UNSPECIFIED")))
      ordered(defaulted.groupBy(col("gen")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("status_legacy").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_status_present"),
        sum(when(col("priority_v2") === "UNSPECIFIED", 1L).otherwise(0L))
          .cast("long").as("n_priority_defaulted"),
        dsum(col("o_totalprice")).as("sum_price")))
    },
    "q_join_dpp" -> { (s, dir) =>
      // Dynamic partition pruning — q_scan_partition_prune's runtime
      // twin and the OTHER 100 TB scan primitive: the fact side is
      // hive-partitioned, but the selective predicate lives on a DIM
      // table, so no static filter reaches the fact scan. DPP plants a
      // dynamicpruningexpression in the fact's PartitionFilters fed by
      // the (broadcast) dim subquery at runtime — non-matching fact
      // partitions are never listed or opened, exactly as if the
      // filter had been static. PlanSpec asserts the pruning
      // expression lands in PartitionFilters.
      val staged = stageOrdersPartitioned(s, dir)
      val fact = s.read.parquet(staged)
      val dim = Tables(s, dir, "orders")
        .select(col("o_orderpriority").as("p")).distinct()
        .filter(col("p").isin("1-URGENT", "2-HIGH"))
      ordered(fact.join(broadcast(dim), fact("o_orderpriority") === dim("p"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price")))
    },
    "q_scan_binaryfile" -> { (s, dir) =>
      // Raw-file ingestion edge for multimodal corpora: the
      // `binaryFile` source reads opaque blobs (image/audio shards)
      // as (path, modificationTime, length, content) rows — the
      // load-bearing first step before any decode UDF. Staged one
      // .bin per document row (distributed foreachPartition write —
      // the shape of an externally-arriving corpus); the report
      // proves every blob arrived intact: per-corpus byte totals and
      // a content-length == metadata-length witness per file. At
      // 100 TB the source parallelizes by file and the
      // pathGlobFilter/recursiveFileLookup options do the listing
      // discipline; blobs stay off the driver.
      val staged = stageDocsBinary(s, dir)
      val files = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin").load(staged)
      ordered(files.agg(
        count(lit(1)).as("n_files"),
        sum(col("length")).cast("long").as("total_bytes"),
        max(col("length")).as("max_bytes"),
        min(col("length")).as("min_bytes"),
        countDistinct(col("length")).as("n_lengths"),
        sum(when(length(col("content")) === col("length"), 1L).otherwise(0L))
          .cast("long").as("n_content_eq")))
    },
    "q_filter_null" -> { (s, dir) =>
      // Fixtures are null-free: manufacture nulls with nullif, then
      // exercise isNull / isNotNull / null-safe equality.
      val c = Tables(s, dir, "customer")
        .withColumn("seg_n", nullif(col("c_mktsegment"), lit("BUILDING")))
      ordered(c.select(
          col("c_custkey"), col("seg_n"),
          col("seg_n").isNull.as("is_b"),
          (col("seg_n") <=> lit("AUTOMOBILE")).as("is_auto"))
        .filter(col("seg_n").isNull || col("seg_n").isNotNull && col("c_custkey") % 3 === 0))
    }
  )

  /** Stage customer as headerless CSV (mtime-invalidated, [[graft.sources.Stage]]). */
  private def stageCustomerCsv(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "customer_csv", "customer") { staged =>
      Tables(s, sfDir, "customer")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .repartition(4)
        .write.mode("overwrite").csv(staged)
    }

  /** Stage documents as tab-delimited text lines (mtime-invalidated).
    * concat_ws SKIPS null inputs, so a null lang would shift text into
    * the lang slot on read-back — field misalignment, not a null round
    * trip. The line format cannot represent nulls at all; staging
    * fails loudly if the fixture ever grows one instead of silently
    * corrupting columns. */
  private def stageDocumentsText(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "documents_text", "documents") { staged =>
      def nonNull(c: Column, n: String): Column = when(c.isNull, raise_error(
        lit(s"documents_text staging: null $n cannot round-trip tab-delimited lines"))
      ).otherwise(c)
      Tables(s, sfDir, "documents")
        .select(concat_ws("\t", nonNull(col("doc_id"), "doc_id"),
          nonNull(col("lang"), "lang"), nonNull(col("text"), "text")).as("value"))
        .repartition(4)
        .write.mode("overwrite").text(staged)
    }

  /** DuckDB twin of q_layout_hilbert: the identical 8 rotation rounds
    * as chained CTEs (rx/ry in an inner subquery per round). */
  private def hilbertOracleSql: String = {
    val rounds = Seq(128, 64, 32, 16, 8, 4, 2, 1).zipWithIndex.map { case (s, i) =>
      s"""h${i + 1} AS (
        |  SELECT l_partkey, l_suppkey,
        |    CASE WHEN ry = 1 THEN hx WHEN rx = 1 THEN 255 - hy ELSE hy END AS hx,
        |    CASE WHEN ry = 1 THEN hy WHEN rx = 1 THEN 255 - hx ELSE hx END AS hy,
        |    hd + $s * $s * (CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 THEN 1
        |      WHEN ry = 1 THEN 2 ELSE 3 END) AS hd
        |  FROM (SELECT *,
        |    CASE WHEN (hx & $s) <> 0 THEN 1 ELSE 0 END AS rx,
        |    CASE WHEN (hy & $s) <> 0 THEN 1 ELSE 0 END AS ry FROM h$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (
      |  SELECT l_partkey, l_suppkey, l_partkey % 256 AS hx,
      |    l_suppkey % 256 AS hy, 0 AS hd
      |  FROM lineitem),
      |$rounds
      |SELECT hd // 1024 AS h_bucket, COUNT(*) AS n_rows,
      |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
      |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
      |FROM h8 GROUP BY 1""".stripMargin +
      orderByAll("h_bucket", "n_rows", "pk_min", "pk_max", "sk_min", "sk_max")
  }

  /** Hilbert xy→d walk over the 256×256 grid: 8 quadrant-rotation
    * rounds folding columns `hx`/`hy` (in [0,256)) and accumulator
    * `hd` (seeded 0) — the standard iterative algorithm as pure
    * integer CASE/mask arithmetic. Shared by q_layout_hilbert and
    * LayoutSpec's bijectivity/adjacency proofs. */
  private[graft] def hilbertIndex(df0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var df = df0
    for (s <- Seq(128, 64, 32, 16, 8, 4, 2, 1)) {
      df = df
        .withColumn("rx", expr(s"CASE WHEN (hx & $s) <> 0 THEN 1 ELSE 0 END"))
        .withColumn("ry", expr(s"CASE WHEN (hy & $s) <> 0 THEN 1 ELSE 0 END"))
        .withColumn("hd", expr(s"hd + $s * $s * (CASE WHEN rx = 0 AND ry = 0 " +
          "THEN 0 WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END)"))
        // reflection uses the FULL-grid constant 255 (n-1), not s-1:
        // bit s may still be set here, and 256 ≡ 0 (mod s) makes the
        // low bits come out identical — while s-1-x would go negative
        .withColumn("hx2", expr(s"CASE WHEN ry = 1 THEN hx WHEN rx = 1 " +
          "THEN 255 - hy ELSE hy END"))
        .withColumn("hy2", expr(s"CASE WHEN ry = 1 THEN hy WHEN rx = 1 " +
          "THEN 255 - hx ELSE hx END"))
        .withColumn("hx", col("hx2")).withColumn("hy", col("hy2"))
        .drop("rx", "ry", "hx2", "hy2")
    }
    df
  }

  /** Stage documents as XML rows (mtime-invalidated): one `<doc>`
    * element per line with entity-escaped content (&→&amp;amp; first,
    * then angle brackets), and a literal `&<>"` tail appended to text
    * pre-escape so the entity path is exercised by every row. */
  private def stageDocumentsXml(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "documents_xml", "documents") { staged =>
      def esc(c: Column): Column =
        replace(replace(replace(c, lit("&"), lit("&amp;")),
          lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
      val lines = Tables(s, sfDir, "documents")
        .select(concat(
          lit("<doc><id>"), col("doc_id").cast("string"),
          lit("</id><lang>"), esc(col("lang")),
          lit("</lang><text>"), esc(concat(col("text"), lit(" &<>\""))),
          lit("</text></doc>")).as("value"))
      // the built-in XML source requires rowTags nested under a root
      // element (a rootless tag sequence drops records); each output
      // partition becomes one file, so frame per partition —
      // mapPartitions is the right tool for per-FILE framing
      import s.implicits._
      lines.repartition(4).as[String]
        .mapPartitions(it => Iterator("<docs>") ++ it ++ Iterator("</docs>"))
        .write.mode("overwrite").text(staged)
    }

  /** Stage documents as CSV lines with PLANTED poison: every 11th
    * row's numeric column is the unparseable token `oops`
    * (mtime-invalidated). */
  private def stageDocumentsCsvPoison(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "documents_csv_poison", "documents") { staged =>
      Tables(s, sfDir, "documents")
        .select(concat(col("doc_id"), lit(","), col("lang"), lit(","),
          when(col("doc_id") % 11 === 0, lit("oops"))
            .otherwise(col("n_chars").cast("string"))).as("value"))
        .repartition(4)
        .write.mode("overwrite").text(staged)
    }

  /** Stage orders as parquet with a bloom filter on o_custkey
    * (mtime-invalidated): repartitioned into several files so the
    * probe has row groups to SKIP, written with the column bloom
    * enabled (1M distinct hint keeps the bitset honest). */
  private def stageOrdersBloom(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "orders_bloom", "orders") { staged =>
      Tables(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .repartition(8, col("o_custkey"))
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_custkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_custkey", "1000000")
        .parquet(staged)
    }

  /** Stage supplier as ORC (mtime-invalidated, [[graft.sources.Stage]]). */
  private def stageSupplierOrc(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "supplier_orc", "supplier") { staged =>
      Tables(s, sfDir, "supplier")
        .repartition(2)
        .write.mode("overwrite").orc(staged)
    }

  /** Stage orders hive-partitioned by o_orderpriority (mtime-invalidated). */
  private def stageOrdersPartitioned(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "orders_part", "orders") { staged =>
      Tables(s, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(staged)
    }

  /** Stage orders as two schema generations under one hive-partitioned
    * root (mtime-invalidated): gen=1 has status_legacy (no priority_v2),
    * gen=2 has priority_v2 (status_legacy dropped). */
  private def stageOrdersEvolved(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "orders_evolved", "orders") { staged =>
      val o = Tables(s, sfDir, "orders")
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus").as("status_legacy"))
        .write.mode("overwrite").parquet(s"$staged/gen=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority").as("priority_v2"))
        .write.mode("overwrite").parquet(s"$staged/gen=2")
      // Stage.once invalidates on the ROOT _SUCCESS marker; the two
      // generation writes left theirs in the subdirs. Touch the mtime
      // explicitly — createNewFile() alone is a no-op on re-stage and
      // would leave the marker permanently older than the fixture.
      val marker = new java.io.File(staged, "_SUCCESS")
      marker.createNewFile()
      marker.setLastModified(System.currentTimeMillis())
    }

  /** Stage one raw .bin file per document row (UTF-8 text bytes) —
    * the on-disk shape of an externally-arriving binary corpus.
    * Distributed: each partition writes its own files (local-FS
    * staging here; an object-store path at scale). */
  private def stageDocsBinary(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "docs_bin", "documents") { staged =>
      new java.io.File(staged).mkdirs()
      val out = staged
      Tables(s, sfDir, "documents").select(col("doc_id"), col("text"))
        .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
          rows.foreach { r =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(out, f"doc_${r.getLong(0)}%07d.bin"),
              r.getString(1).getBytes("UTF-8"))
          }
        }
      val m = new java.io.File(out, "_SUCCESS")
      m.createNewFile()
      m.setLastModified(System.currentTimeMillis())
    }

  /** Stage events as Avro container files via the Hadoop RDD bridge
    * (mtime-invalidated, [[graft.sources.Stage]]). */
  private def stageEventsAvro(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "events_avro", "events") { staged =>
      import org.apache.avro.generic.GenericRecord
      import org.apache.avro.mapred.AvroKey
      import org.apache.avro.mapreduce.{AvroJob, AvroKeyOutputFormat}
      import org.apache.hadoop.io.NullWritable
      val base = graft.sources.SchemaRegistry.schemaOf("events")
      val cols = base.fields.map(_.name).toSeq
      val json = graft.sources.SchemaRegistry.avroSchemaJson("events")
      val fieldArr = base.fields
      val wjob = org.apache.hadoop.mapreduce.Job.getInstance(
        s.sparkContext.hadoopConfiguration)
      AvroJob.setOutputKeySchema(wjob, new org.apache.avro.Schema.Parser().parse(json))
      Tables(s, sfDir, "events").select(cols.map(col): _*)
        .repartition(4).rdd
        .mapPartitions { it =>
          val schema = new org.apache.avro.Schema.Parser().parse(json)
          it.map(r => (new AvroKey[GenericRecord](
            graft.sources.SchemaRegistry.toAvroRecord(schema, fieldArr, r)),
            NullWritable.get()))
        }
        .saveAsNewAPIHadoopFile(staged, classOf[AvroKey[GenericRecord]],
          classOf[NullWritable], classOf[AvroKeyOutputFormat[GenericRecord]],
          wjob.getConfiguration)
    }

  /** Stage events as JSON-lines (mtime-invalidated, [[graft.sources.Stage]]). */
  private def stageEventsJson(s: SparkSession, sfDir: String): String =
    graft.sources.Stage.once(sfDir, "events_json", "events") { staged =>
      graft.sources.SchemaRegistry.encode(Tables(s, sfDir, "events"),
          Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
        .repartition(4)
        .write.mode("overwrite").text(staged)
    }

  def oracle: Map[String, String] = Map(
    "q_join_dpp" ->
      ("""SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin +
        orderByAll("o_orderpriority", "n_orders", "sum_price")),
    "q_scan_binaryfile" ->
      ("""SELECT COUNT(*) AS n_files,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  CAST(MAX(octet_length(CAST(text AS BLOB))) AS BIGINT) AS max_bytes,
        |  CAST(MIN(octet_length(CAST(text AS BLOB))) AS BIGINT) AS min_bytes,
        |  CAST(COUNT(DISTINCT octet_length(CAST(text AS BLOB))) AS BIGINT) AS n_lengths,
        |  COUNT(*) AS n_content_eq
        |FROM documents""".stripMargin +
        orderByAll("n_files", "total_bytes", "max_bytes", "min_bytes",
          "n_lengths", "n_content_eq")),
    "q_scan_schema_evolution" ->
      ("""WITH merged AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus AS status_legacy,
        |    NULL AS priority_v2, 1 AS gen
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, NULL, o_orderpriority, 2
        |  FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT gen, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN status_legacy IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_status_present,
        |  CAST(SUM(CASE WHEN COALESCE(priority_v2, 'UNSPECIFIED') = 'UNSPECIFIED'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_priority_defaulted,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    AS sum_price
        |FROM merged GROUP BY gen""".stripMargin +
        orderByAll("gen", "n_rows", "n_status_present",
          "n_priority_defaulted", "sum_price")),
    "q_layout_hilbert" -> hilbertOracleSql,
    "q_layout_zorder" ->
      ("""WITH n AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_partkey % 65536 AS x, l_suppkey % 65536 AS y
        |  FROM lineitem),
        |a AS (SELECT *, (x | (x << 8)) & 16711935 AS x1,
        |             (y | (y << 8)) & 16711935 AS y1 FROM n),
        |b AS (SELECT *, (x1 | (x1 << 4)) & 252645135 AS x2,
        |             (y1 | (y1 << 4)) & 252645135 AS y2 FROM a),
        |c AS (SELECT *, (x2 | (x2 << 2)) & 858993459 AS x3,
        |             (y2 | (y2 << 2)) & 858993459 AS y3 FROM b),
        |d AS (SELECT *,
        |  ((x3 | (x3 << 1)) & 1431655765)
        |    | (((y3 | (y3 << 1)) & 1431655765) << 1) AS z FROM c)
        |SELECT z // 65536 AS z_bucket, COUNT(*) AS n_rows,
        |  MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
        |  MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
        |FROM d GROUP BY 1""".stripMargin +
        orderByAll("z_bucket", "n_rows", "pk_min", "pk_max",
          "sk_min", "sk_max")),
    "q_scan_csv_malformed" ->
      ("""SELECT COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
        |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_good,
        |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 0 ELSE n_chars END) AS BIGINT) AS sum_chars_good,
        |  CAST(SUM(CASE WHEN doc_id % 11 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt_marked
        |FROM documents""".stripMargin +
        orderByAll("n_rows", "n_corrupt", "n_good", "sum_chars_good",
          "n_corrupt_marked")),
    "q_scan_parquet_bloom" ->
      ("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_custkey IN (11, 407, 1013)""".stripMargin +
        orderByAll("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")),
    "q_scan_orc" ->
      ("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 1000.0""".stripMargin +
        orderByAll("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
    "q_scan_partition_prune" ->
      ("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin +
        orderByAll("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")),
    "q_scan_json" ->
      ("""SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |  user_id, event_type, value
        |FROM events WHERE user_id < 100""".stripMargin +
        orderByAll("event_id", "ts_us", "user_id", "event_type", "value")),
    "q_scan_avro" ->
      // same plain filtered projection: any loss in the container
      // round trip (timestamp micros, IEEE doubles) hash-mismatches
      ("""SELECT event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
        |  user_id, event_type, value
        |FROM events WHERE user_id < 100""".stripMargin +
        orderByAll("event_id", "ts_us", "user_id", "event_type", "value")),
    "q_scan_csv" ->
      ("""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_acctbal > 1000.0""".stripMargin +
        orderByAll("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")),
    "q_scan_text" ->
      ("SELECT doc_id, lang, text FROM documents" +
        orderByAll("doc_id", "lang", "text")),
    "q_scan_xml" ->
      ("""SELECT doc_id, lang,
        |  CAST(length(text || ' &<>"') AS BIGINT) AS n_chars_rt,
        |  md5(text || ' &<>"') AS text_md5
        |FROM documents""".stripMargin +
        orderByAll("doc_id", "lang", "n_chars_rt", "text_md5")),
    "q_scan_project" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem" +
        orderByAll("l_orderkey", "l_linenumber", "l_extendedprice")),
    "q_scan_filter_pushdown" ->
      ("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin +
        orderByAll("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")),
    "q_scan_union_files" ->
      ("""SELECT c_custkey AS key, c_name AS name, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey AS key, s_name AS name, 'supplier' AS src FROM supplier""".stripMargin +
        orderByAll("key", "name", "src")),
    "q_project_expr" ->
      ("""SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  l_quantity * l_extendedprice AS gross FROM lineitem""".stripMargin +
        orderByAll("l_orderkey", "l_linenumber", "revenue", "gross")),
    "q_filter_compound" ->
      ("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
        |WHERE (o_orderstatus = 'F' OR o_orderstatus = 'P')
        |  AND o_totalprice BETWEEN 50000.0 AND 200000.0
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND NOT (o_orderkey % 7 = 0)""".stripMargin +
        orderByAll("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")),
    "q_filter_null" ->
      ("""SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg_n,
        |  nullif(c_mktsegment, 'BUILDING') IS NULL AS is_b,
        |  nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE' AS is_auto
        |FROM customer
        |WHERE nullif(c_mktsegment, 'BUILDING') IS NULL
        |   OR (nullif(c_mktsegment, 'BUILDING') IS NOT NULL AND c_custkey % 3 = 0)""".stripMargin +
        orderByAll("c_custkey", "seg_n", "is_b", "is_auto"))
  )
}
