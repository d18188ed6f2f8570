package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot/commit-log table layer (r9, VERDICT r8 item 2) —
  * the public Delta/Iceberg design reduced to its load-bearing core:
  *
  *   - a table is `root/data/<unique>.parquet` files plus an append-only
  *     log `root/_graft_log/v%09d.json`, each manifest the COMPLETE
  *     file listing of one snapshot version;
  *   - a commit stages its manifest to a temp name and publishes with
  *     one ATOMIC rename — readers either see version N or N+1, never
  *     a half-written listing (and never a half-written data set: data
  *     files are invisible until a manifest names them);
  *   - optimistic concurrency: the rename FAILS if the target version
  *     exists, so of two racing writers exactly one commits and the
  *     loser re-reads and retries — the Delta protocol's mutual
  *     exclusion, provided here by the filesystem's atomic rename;
  *   - reads pin a version: the scan is built from the manifest's
  *     explicit file list, so a concurrent compaction or append is
  *     invisible (snapshot isolation). Compaction REWRITES data into
  *     new files and commits a new manifest; it never deletes — file
  *     removal is a separate vacuum concern (old snapshots stay
  *     readable until then), exactly the public lakehouse split.
  *
  * 100 TB posture: the manifest replaces directory LISTING with a
  * metadata read — the object-store list call that dominates wide
  * tables is gone; planning cost scales with the file count in one
  * manifest. Per-file column statistics live IN the manifest too
  * (appendWithStats/prunedRead — the Delta stats-JSON / Iceberg
  * manifest-bounds design), so selective scans prune files from the
  * log alone; the remaining natural step (manifest segments for
  * million-file tables) is likewise data-independent metadata. This
  * closes the reader-vs-compaction race SCALING.md flags for
  * s_compact_files: a reader pinned to version N is unaffected by a
  * concurrent rewrite (asserted in StreamingSpec).
  */
object CommitLog {
  private def logDir(root: String) = new java.io.File(root, "_graft_log")
  private def manifest(root: String, v: Long) =
    new java.io.File(logDir(root), f"v$v%09d.json")

  /** Hand-built JSON (strings are path-safe by construction: UUID file
    * names under data/); parsed back with Spark's Jackson. `op` records
    * the commit KIND — incremental readers need it to distinguish
    * data-adding commits (append) from data-neutral rewrites (compact),
    * the public change-data-feed design's commit metadata. */
  private def renderManifest(version: Long, files: Seq[String], op: String,
      statsCol: Option[String] = None,
      stats: Map[String, (Long, Long)] = Map.empty,
      schemaJson: Option[String] = None): String = {
    val base = s"""{"version":$version,"op":"$op",""" +
      s""""files":[${files.map(f => "\"" + f + "\"").mkString(",")}]"""
    val statsJson = statsCol match {
      case Some(c) if stats.nonEmpty =>
        s""","statsCol":"$c","stats":{""" +
          stats.toSeq.sortBy(_._1).map { case (f, (lo, hi)) =>
            s""""$f":[$lo,$hi]""" }.mkString(",") + "}"
      case _ => ""
    }
    // StructType.json is already a JSON object — embedded raw
    val schemaField = schemaJson.map(j => s""","schema":$j""").getOrElse("")
    base + statsJson + schemaField + "}"
  }

  def latestVersion(root: String): Option[Long] =
    Option(logDir(root).listFiles())
      .map(_.toSeq.map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong))
      .filter(_.nonEmpty).map(_.max)

  /** Does `version`'s manifest still exist? False once vacuum dropped
    * it — the probe incremental readers use to seed a startingVersion
    * diff without tripping over the retention floor. */
  private[sources] def manifestExists(root: String, version: Long): Boolean =
    manifest(root, version).exists()

  private[sources] def readManifest(root: String, version: Long): (String, Seq[String]) = {
    val f = manifest(root, version)
    require(f.exists(), s"commit log has no version $version under $root")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(f.toPath))
    val files = node.get("files")
    require(files != null,
      s"version $version under $root is a SEGMENTED manifest — " +
        "read it through segmentsOf/segmentedPrunedRead, not the flat-manifest API")
    (Option(node.get("op")).map(_.asText()).getOrElse("append"),
      (0 until files.size()).map(i => files.get(i).asText()))
  }

  /** The complete file listing of snapshot `version` (absolute paths). */
  def snapshotFiles(root: String, version: Long): Seq[String] =
    readManifest(root, version)._2.map(f => new java.io.File(root, f).toString)

  /** The commit kind of `version`: "append" (adds data) or "compact"
    * (rewrites, data-neutral). */
  def snapshotOp(root: String, version: Long): String =
    readManifest(root, version)._1

  /** Publish `files` (paths relative to root) as the next version after
    * `expected` (None = first commit). Publication is an atomic
    * CREATE-IF-ABSENT: a hard link to the staged manifest — rename(2)
    * would silently REPLACE an existing target on POSIX, so it cannot
    * arbitrate racing committers; link(2) is atomic and fails with
    * EEXIST, giving exactly one winner (the put-if-absent primitive the
    * public table formats require of their log store). The loser gets a
    * clean conflict to re-read and retry on. */
  def commit(root: String, files: Seq[String], expected: Option[Long],
      op: String = "append", statsCol: Option[String] = None,
      stats: Map[String, (Long, Long)] = Map.empty,
      schemaJson: Option[String] = None): Long = {
    val next = expected.map(_ + 1).getOrElse(0L)
    publish(root, next, renderManifest(next, files, op, statsCol, stats, schemaJson))
    next
  }

  /** Atomic create-if-absent publication of version `next`'s manifest
    * content (the link(2) put-if-absent primitive — see commit()). */
  private def publish(root: String, next: Long, content: String): Unit = {
    logDir(root).mkdirs()
    val tmp = java.nio.file.Files.createTempFile(logDir(root).toPath, s".v$next-", ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    try {
      java.nio.file.Files.createLink(manifest(root, next).toPath, tmp)
      java.nio.file.Files.delete(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        java.nio.file.Files.deleteIfExists(tmp)
        throw new java.util.ConcurrentModificationException(
          s"commit conflict: version $next already published under $root")
    }
  }

  /** The schema JSON the previous version's manifest carries, if any —
    * every commit kind passes it forward so one schema-unaware writer
    * never strips an evolved table's log schema (the stats-carry
    * rule, applied to the schema). Segment manifests are a separate
    * format without a schema field — the segmented keys build fresh,
    * never-evolved tables. */
  private def carriedSchemaJson(root: String, prev: Option[Long]): Option[String] =
    prev.flatMap(v => snapshotSchemaOf(root, v)).map(_.json)

  /** Enforce the log schema at WRITE time on every append-like path —
    * the other half of appendEvolved's "type conflicts fail the
    * COMMIT, not some later read" contract: without this, a plain
    * append of a retyped column commits fine and explodes at scan
    * time, and an append with an EXTRA column commits data the log
    * schema makes invisible to every reader (silent loss). Subsets
    * are fine — missing columns project as nulls under the log
    * schema. No-op on never-evolved tables (no recorded schema). */
  private def requireSchemaCompatible(root: String, prev: Option[Long],
      df: DataFrame, opName: String): Unit =
    prev.flatMap(v => snapshotSchemaOf(root, v)).foreach { st =>
      val byName = st.fields.map(f => f.name -> f.dataType).toMap
      df.schema.fields.foreach { f =>
        byName.get(f.name) match {
          case None => throw new IllegalArgumentException(
            s"$opName: column '${f.name}' is not in the table schema — " +
              "use appendEvolved to add columns (it would otherwise be " +
              "invisible to every reader of the log schema)")
          case Some(dt) => require(dt == f.dataType,
            s"$opName: column '${f.name}' is $dt in the table but " +
              s"${f.dataType} in the write — evolution never retypes")
        }
      }
    }

  /** Stage `df` as `nFiles` new data files and commit them APPENDED to
    * the current snapshot (or as the first snapshot). Data files land
    * under data/ with unique names but stay invisible to readers until
    * the manifest rename publishes them. */
  def append(s: SparkSession, root: String, df: DataFrame, nFiles: Int): Long = {
    val prev = latestVersion(root)
    requireSchemaCompatible(root, prev, df, "append")
    val prevFiles = prev.map(v => snapshotFiles(root, v)
      .map(p => relativize(root, p))).getOrElse(Nil)
    // stats are per-FILE metadata: a commit that carries a file forward
    // carries its stats entry too (the new stat-less files are simply
    // unprunable), so one stats-unaware writer never strips the whole
    // snapshot's skipping metadata
    val (prevCol, prevStats) =
      prev.map(v => snapshotStatsOf(root, v)).getOrElse((None, Map.empty[String, (Long, Long)]))
    commit(root, prevFiles ++ stageDataFiles(s, root, df, nFiles), prev,
      statsCol = prevCol, stats = prevStats,
      schemaJson = carriedSchemaJson(root, prev))
  }

  /** Rewrite the CURRENT snapshot into `nFiles` compacted data files
    * and commit a manifest listing ONLY those — old files remain on
    * disk for pinned readers (vacuum is separate, as in the public
    * designs). */
  def compact(s: SparkSession, root: String, nFiles: Int): Long = {
    val prev = latestVersion(root)
      .getOrElse(sys.error(s"cannot compact an empty table at $root"))
    val cur = read(s, root, prev)
    commit(root, stageDataFiles(s, root, cur, nFiles), Some(prev), op = "compact",
      schemaJson = carriedSchemaJson(root, Some(prev)))
  }

  /** Read the table AS OF `version` — the time-travel scan: explicit
    * file list from the manifest, no directory listing anywhere. If
    * the manifest records a schema (a schema-evolved table), the scan
    * uses IT — files predating an added column project nulls for it,
    * and planning never opens a parquet footer (the Delta
    * schema-in-the-log design; `mergeSchema` footer reads are the
    * cost this avoids at 10^5 files). */
  def read(s: SparkSession, root: String, version: Long): DataFrame =
    readSubset(s, root, version, snapshotFiles(root, version))

  /** Read an explicit subset of `version`'s files under the manifest
    * schema when one is recorded — every partial-snapshot reader
    * (pruned scan, CDF delta, CoW dirty-file pass) must use this, not
    * a raw parquet read: on a schema-evolved table a raw read
    * footer-infers from a sampled file and an added column silently
    * appears or vanishes with the sample. */
  private def readSubset(s: SparkSession, root: String, version: Long,
      files: Seq[String]): DataFrame =
    snapshotSchemaOf(root, version) match {
      case Some(st) => s.read.schema(st).parquet(files: _*)
      case None => s.read.parquet(files: _*)
    }

  /** The schema the manifest of `version` records, if its committing
    * writer was schema-aware (appendEvolved); None = pre-evolution
    * manifest, reader falls back to footer inference. */
  def snapshotSchemaOf(root: String, version: Long): Option[org.apache.spark.sql.types.StructType] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(manifest(root, version).toPath))
    Option(node.get("schema")).map(j =>
      org.apache.spark.sql.types.DataType.fromJson(j.toString)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Schema-evolving APPEND — add-column through the log (the public
    * formats' schema evolution): the committed manifest records the
    * UNION schema (prior columns in their order, then `df`'s new
    * columns), so readers of the new version project nulls for the
    * added columns over pre-evolution files without ever reading a
    * footer, while readers pinned at older versions keep the exact
    * schema their manifest recorded (schema changes are versioned
    * like data changes). Type conflicts on a shared column name fail
    * the COMMIT, not some later read — the log is the schema
    * authority, so it enforces compatibility at write time. */
  def appendEvolved(s: SparkSession, root: String, df: DataFrame,
      nFiles: Int): Long = {
    val prev = latestVersion(root)
    val prevFiles = prev.map(v => snapshotFiles(root, v)
      .map(p => relativize(root, p))).getOrElse(Nil)
    val prevSchema: Seq[org.apache.spark.sql.types.StructField] =
      prev.map { v =>
        snapshotSchemaOf(root, v)
          .getOrElse(s.read.parquet(snapshotFiles(root, v): _*).schema)
          .fields.toSeq
      }.getOrElse(Nil)
    val byName = prevSchema.map(f => f.name -> f).toMap
    df.schema.fields.foreach { f =>
      byName.get(f.name).foreach { p =>
        require(p.dataType == f.dataType,
          s"appendEvolved: column '${f.name}' is ${p.dataType} in the " +
            s"table but ${f.dataType} in the append — evolution adds " +
            "columns, it never retypes them")
      }
    }
    val merged = org.apache.spark.sql.types.StructType(
      prevSchema ++ df.schema.fields.filterNot(f => byName.contains(f.name)))
    val (prevCol, prevStats) =
      prev.map(v => snapshotStatsOf(root, v)).getOrElse((None, Map.empty[String, (Long, Long)]))
    commit(root, prevFiles ++ stageDataFiles(s, root, df, nFiles), prev,
      statsCol = prevCol, stats = prevStats, schemaJson = Some(merged.json))
  }

  /** Per-file column statistics of `version`'s manifest: the stats
    * column name (if the committing writer recorded one) and
    * file → (min, max), relative paths. Files without an entry are
    * UNPRUNABLE — a reader must always scan them (mixed manifests
    * stay correct across writers that don't compute stats). */
  def snapshotStatsOf(root: String, version: Long): (Option[String], Map[String, (Long, Long)]) = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(manifest(root, version).toPath))
    val colName = Option(node.get("statsCol")).map(_.asText())
    val stats = Option(node.get("stats")).map { st =>
      val it = st.fields()
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
      }
      b.result()
    }.getOrElse(Map.empty)
    (colName, stats)
  }

  /** Append with per-file min/max statistics on integer column
    * `statsCol` — the manifest-level file-skipping metadata of the
    * public table formats (Delta's stats JSON / Iceberg's manifest
    * column bounds): planning consults the LOG, not file footers, so
    * a selective scan opens only overlapping files. Stats are computed
    * from the staged files in one small aggregate per file (staging-
    * time cost, amortized over every future pruned read). Prior
    * versions' entries carry over, so the whole snapshot stays
    * prunable after many appends. */
  /** Per-file min/max of `statsCol` over `staged` (relative paths) in
    * ONE Spark job — a groupBy(input_file_name) aggregate, not a
    * read+agg+collect per file (N driver round-trips on the commit
    * path). An all-NULL or empty file yields no entry: stat-less ⇒
    * unprunable, the safe default. Paths compare canonicalized so a
    * relative `root` still matches input_file_name's absolute URIs.
    * Column names are validated here because they interpolate into
    * hand-built manifest JSON — a quote or backslash would commit a
    * permanently unparseable manifest. */
  private def perFileStats(s: SparkSession, root: String,
      staged: Seq[String], statsCol: String): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    require(!statsCol.exists(c => c == '"' || c == '\\' || c < ' '),
      s"statsCol '$statsCol' would corrupt the manifest JSON")
    if (staged.isEmpty) return Map.empty
    val byCanon = staged.map(rel =>
      new java.io.File(root, rel).getCanonicalPath -> rel).toMap
    s.read.parquet(staged.map(rel => new java.io.File(root, rel).toString): _*)
      .groupBy(input_file_name().as("_graft_file"))
      .agg(min(col(statsCol)).as("mn"), max(col(statsCol)).as("mx"))
      .collect().toSeq.flatMap { r =>
        if (r.isNullAt(1) || r.isNullAt(2)) None
        else byCanon
          .get(new java.io.File(new java.net.URI(r.getString(0))).getCanonicalPath)
          .map(_ -> (r.getLong(1), r.getLong(2)))
      }.toMap
  }

  def appendWithStats(s: SparkSession, root: String, df: DataFrame,
      nFiles: Int, statsCol: String): Long = {
    val prev = latestVersion(root)
    requireSchemaCompatible(root, prev, df, "appendWithStats")
    val prevFiles = prev.map(v => snapshotFiles(root, v)
      .map(p => relativize(root, p))).getOrElse(Nil)
    // carried stats stay only if the previous writer recorded the SAME
    // column — carrying another column's bounds under this one's name
    // would make pruned reads skip files that DO hold matching rows
    val (prevCol, prevStats0) =
      prev.map(v => snapshotStatsOf(root, v)).getOrElse((None, Map.empty[String, (Long, Long)]))
    val prevStats =
      if (prevCol.contains(statsCol)) prevStats0
      else Map.empty[String, (Long, Long)]
    val staged = stageDataFiles(s, root, df, nFiles)
    commit(root, prevFiles ++ staged, prev,
      statsCol = Some(statsCol),
      stats = prevStats ++ perFileStats(s, root, staged, statsCol),
      schemaJson = carriedSchemaJson(root, prev))
  }

  /** Stats-pruned scan: the files of `version` whose [min, max] range
    * on the stats column OVERLAPS [lo, hi], plus every file without
    * stats (unprunable ⇒ always read). Returns (dataframe over the
    * surviving files, filesTotal, filesRead). Pruning is a pure
    * metadata decision — the caller still applies its precise
    * predicate, so correctness never depends on the stats. */
  def prunedRead(s: SparkSession, root: String, version: Long,
      lo: Long, hi: Long): (DataFrame, Int, Int) = {
    val files = readManifest(root, version)._2
    val (_, stats) = snapshotStatsOf(root, version)
    val keep = files.filter { f =>
      stats.get(f) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None => true
      }
    }
    val df =
      if (keep.isEmpty) read(s, root, version).limit(0)
      else readSubset(s, root, version,
        keep.map(f => new java.io.File(root, f).toString))
    (df, files.size, keep.size)
  }

  /** Incremental (change-data-feed-style) read: the rows ADDED between
    * `fromVersion` (exclusive) and `toVersion` (inclusive) = the scan
    * of exactly the data files that joined the listing — an
    * append-only table's CDC without any diffing of row contents.
    * Requires every commit in the range to be an append: a compaction
    * rewrites unchanged rows into new files, so a file-level diff
    * across it would re-emit old data as "new" (the public CDF designs
    * carry the same caveat and skip data-neutral commits by commit
    * metadata, which is what `op` records). */
  def changes(s: SparkSession, root: String, fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion < toVersion,
      s"changes: need fromVersion < toVersion, got $fromVersion..$toVersion")
    ((fromVersion + 1) to toVersion).foreach { v =>
      val op = snapshotOp(root, v)
      require(op == "append",
        s"changes: version $v is a '$op' commit — file-level diff across " +
          "a rewrite would re-emit unchanged rows; read full snapshots instead")
    }
    val before = snapshotFiles(root, fromVersion).toSet
    val added = snapshotFiles(root, toVersion).filterNot(before)
    if (added.isEmpty) read(s, root, toVersion).limit(0)
    else readSubset(s, root, toVersion, added)
  }

  /** Idempotent STREAMING append — the Delta streaming-sink design:
    * micro-batch `batchId` publishes as exactly snapshot version
    * `batchId`, so the commit log itself is the transaction record.
    * A restarted query re-delivering batch N (at-least-once upstream)
    * finds version N already published and SKIPS — table-level
    * exactly-once without any side channel; a concurrent committer
    * race on the same version is settled by the log's atomic
    * create-if-absent (the loser's staged files are orphans for
    * vacuum, as in the public formats). Returns true iff THIS call
    * published the version. */
  def appendBatch(s: SparkSession, root: String, df: DataFrame,
      nFiles: Int, batchId: Long): Boolean = {
    if (manifest(root, batchId).exists()) return false
    requireSchemaCompatible(root,
      if (batchId == 0) None else Some(batchId - 1), df, "appendBatch")
    val prevFiles =
      if (batchId == 0) Nil
      else snapshotFiles(root, batchId - 1).map(p => relativize(root, p))
    val (prevCol, prevStats) =
      if (batchId == 0) (None, Map.empty[String, (Long, Long)])
      else snapshotStatsOf(root, batchId - 1)
    val staged = stageDataFiles(s, root, df, nFiles)
    try {
      commit(root, prevFiles ++ staged,
        if (batchId == 0) None else Some(batchId - 1),
        statsCol = prevCol, stats = prevStats,
        schemaJson = carriedSchemaJson(root,
          if (batchId == 0) None else Some(batchId - 1)))
      true
    } catch {
      case _: java.util.ConcurrentModificationException => false
    }
  }

  /** Copy-on-write row-level DELETE (the public Delta/Iceberg CoW
    * write path): one pass finds the data files that HOLD matching
    * rows (`input_file_name` + distinct — the collect is file PATHS,
    * metadata-sized, never rows), untouched files carry over into the
    * new manifest byte-identical (their paths are reused, no rewrite,
    * no read), and only the dirty files are rewritten without their
    * matching rows. Commits op="delete" — a data-CHANGING rewrite, so
    * `changes()` refuses ranges across it just as it refuses
    * compactions (a file-level diff would mis-state the delta).
    *
    * 100 TB posture: cost scales with the DIRTY file set, not the
    * table — a predicate aligned with the layout (partition/z-order
    * keys) touches few files; the dirty-file scan itself benefits from
    * parquet pushdown of `cond`. Pinned readers at older versions
    * still see the deleted rows (snapshot isolation), exactly the
    * lakehouse contract. Returns (newVersion, filesCarried,
    * filesRewritten). */
  def delete(s: SparkSession, root: String,
      cond: org.apache.spark.sql.Column): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.input_file_name
    val prev = latestVersion(root)
      .getOrElse(sys.error(s"cannot delete from an empty table at $root"))
    val files = snapshotFiles(root, prev)
    // canonical paths on both sides: input_file_name yields absolute
    // URIs while snapshotFiles reflects the caller's (possibly
    // relative) root — a raw string compare would mark nothing dirty
    // and silently no-op the delete
    val dirtyCanon = readSubset(s, root, prev, files).filter(cond)
      .select(input_file_name()).distinct()
      .collect().map(r =>
        new java.io.File(new java.net.URI(r.getString(0))).getCanonicalPath)
      .toSet
    val (dirty, clean) =
      files.partition(f => dirtyCanon.contains(new java.io.File(f).getCanonicalPath))
    val carried = clean.map(p => relativize(root, p))
    val rewritten =
      if (dirty.isEmpty) Nil
      // keep = NOT(cond) under three-valued logic would DROP rows where
      // cond is NULL (a NULL-keyed row is not a match — it must survive)
      else stageDataFiles(s, root,
        readSubset(s, root, prev, dirty)
          .filter(!org.apache.spark.sql.functions.coalesce(
            cond, org.apache.spark.sql.functions.lit(false))),
        math.max(1, dirty.size))
    // carried files keep their stats entries; rewritten files have no
    // stats (unprunable) unless a stats-aware writer recomputes them
    val (prevCol, prevStats) = snapshotStatsOf(root, prev)
    val v = commit(root, carried ++ rewritten, Some(prev), op = "delete",
      statsCol = prevCol,
      stats = { val cs = carried.toSet; prevStats.filter(kv => cs(kv._1)) },
      schemaJson = carriedSchemaJson(root, Some(prev)))
    (v, clean.size.toLong, rewritten.size.toLong)
  }

  /** Copy-on-write MERGE (upsert) — the Delta MERGE INTO write path,
    * completing the log's write trio (append / delete / merge):
    * matched keys are REPLACED by their update rows, unmatched update
    * rows INSERT. One pass finds the data files holding matched keys
    * (a left-semi join against the update keys; the collect is file
    * PATHS, metadata-sized), clean files carry over byte-identical,
    * dirty files are rewritten WITHOUT their matched rows, and every
    * update row (replacement + insert alike) stages into new files —
    * all published as ONE atomic commit, op="merge" (a data-changing
    * rewrite: changes() refuses file-diff ranges across it, pinned
    * readers at older versions still see pre-merge rows).
    *
    * 100 TB posture: cost scales with the DIRTY file set plus the
    * update volume, never the table — a key-aligned layout (partition
    * or cluster by the merge key, q_table_optimize) keeps the dirty
    * set small, and the dirty-file scan pushes the key predicate to
    * parquet. Returns (newVersion, filesCarried, filesRewritten). */
  def merge(s: SparkSession, root: String, updates: DataFrame,
      keyCol: String, nInsertFiles: Int): (Long, Long, Long) = {
    import org.apache.spark.sql.functions.{col, input_file_name}
    val prev = latestVersion(root)
      .getOrElse(sys.error(s"cannot merge into an empty table at $root"))
    val files = snapshotFiles(root, prev)
    val keys = updates.select(col(keyCol)).distinct()
    // input_file_name is captured BEFORE the join (after a join the
    // expression is ambiguous across sources and Spark rejects it)
    // canonical paths on both sides (see delete() — a relative root
    // would otherwise silently turn the merge into insert-only)
    val dirtyCanon = readSubset(s, root, prev, files)
      .select(col(keyCol), input_file_name().as("_graft_file"))
      .join(keys, Seq(keyCol), "left_semi")
      .select(col("_graft_file")).distinct()
      .collect().map(r =>
        new java.io.File(new java.net.URI(r.getString(0))).getCanonicalPath)
      .toSet
    val (dirty, clean) =
      files.partition(f => dirtyCanon.contains(new java.io.File(f).getCanonicalPath))
    val carried = clean.map(p => relativize(root, p))
    val rewritten =
      if (dirty.isEmpty) Nil
      else stageDataFiles(s, root,
        readSubset(s, root, prev, dirty).join(keys, Seq(keyCol), "left_anti"),
        math.max(1, dirty.size))
    val inserted = stageDataFiles(s, root, updates, nInsertFiles)
    val (prevCol, prevStats) = snapshotStatsOf(root, prev)
    val v = commit(root, carried ++ rewritten ++ inserted, Some(prev), op = "merge",
      statsCol = prevCol,
      stats = { val cs = carried.toSet; prevStats.filter(kv => cs(kv._1)) },
      schemaJson = carriedSchemaJson(root, Some(prev)))
    (v, clean.size.toLong, rewritten.size.toLong)
  }

  /** RESTORE — roll the table back to `toVersion` (the Delta RESTORE
    * command), completing time travel from read-only pinning into a
    * writable rollback: the new HEAD's manifest re-lists exactly
    * `toVersion`'s files (plus its stats and schema), committed as a
    * NEW version — history is append-only, the bad versions stay
    * readable for audit, and a second restore can undo the undo.
    * op="restore" marks a data-changing transition, so changes()
    * refuses file-diff ranges across it like any rewrite. Zero data
    * I/O: the restore is one manifest read and one commit (the
    * restored files must still exist — a vacuum that dropped
    * pre-retention versions limits how far back restore reaches,
    * exactly the public trade). Returns the new head version. */
  def restore(root: String, toVersion: Long): Long = {
    val prev = latestVersion(root)
      .getOrElse(sys.error(s"cannot restore an empty table at $root"))
    require(toVersion <= prev, s"restore: version $toVersion > head $prev")
    val (_, files) = readManifest(root, toVersion)
    // enforce, not just document, the retention trade: a vacuum that
    // dropped toVersion's data files must fail HERE with a clear
    // error, not publish a head with dangling entries that only
    // breaks at read time
    val missing = files.filterNot(f => new java.io.File(root, f).exists())
    require(missing.isEmpty,
      s"restore: vacuumed past restore target $toVersion — " +
        s"${missing.size} of its data file(s) no longer exist " +
        s"(e.g. ${missing.headOption.getOrElse("")}); restore only " +
        "reaches versions inside the vacuum retention floor")
    val (statsCol, stats) = snapshotStatsOf(root, toVersion)
    commit(root, files, Some(prev), op = "restore",
      statsCol = statsCol, stats = stats,
      schemaJson = snapshotSchemaOf(root, toVersion).map(_.json))
  }

  /** Retention-gated file removal — the other half of "compaction
    * never deletes": physically drop data files referenced ONLY by
    * versions older than `retainFrom` (plus their manifests). Readers
    * pinned at >= retainFrom are untouched because anything their
    * manifests name is kept; readers pinned older lose their snapshot
    * — which is the retention contract every public table format
    * ships (vacuum trades time-travel depth for storage).
    *
    * `graceMs` guards the vacuum-vs-in-flight-writer race: a
    * concurrent writer stages data files BEFORE any manifest names
    * them, and a zero-grace vacuum would delete them out from under
    * the commit (which then publishes dangling entries). Files younger
    * than `graceMs` are kept — the public formats ship the same
    * defense as a retention PERIOD (Delta's default is 7 days);
    * the fixture keys run single-writer and use the 0 default so the
    * crash-orphan reclamation stays deterministic.
    * Returns (filesRemoved, filesKept). */
  def vacuum(root: String, retainFrom: Long, graceMs: Long = 0L): (Long, Long) = {
    val latest = latestVersion(root)
      .getOrElse(sys.error(s"cannot vacuum an empty table at $root"))
    require(retainFrom <= latest, s"retainFrom $retainFrom > latest $latest")
    val keep = (retainFrom to latest)
      .flatMap(v => readManifest(root, v)._2).toSet
    val dataDir = new java.io.File(root, "data")
    val all = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
    val now = System.currentTimeMillis()
    val (kept, dropped) = all.partition(f =>
      keep.contains("data/" + f.getName) ||
        (graceMs > 0 && now - f.lastModified() < graceMs))
    dropped.foreach(_.delete())
    (0L until retainFrom).foreach(v =>
      java.nio.file.Files.deleteIfExists(manifest(root, v).toPath))
    (dropped.length.toLong, kept.length.toLong)
  }

  /** Optimistic-retry APPEND — the multi-writer commit protocol of the
    * public formats (Delta's optimistic concurrency control): stage the
    * data files ONCE, then loop {read head, rebase, attempt commit};
    * a lost race costs one manifest re-read and one more create-if-
    * absent attempt, never a data rewrite. The rebase is sound because
    * an append's logical action is "ADD these files", which commutes
    * with every commit kind this log ships: the winning head's manifest
    * is a COMPLETE listing of its snapshot, so winner-listing + our
    * staged files preserves both writers' rows whether the winner was
    * another append, a compaction, an optimize (both data-neutral
    * rewrites) or a delete (the delete acted on ITS snapshot — blind
    * appends land after it, the WriteSerializable contract). Rewrites
    * racing EACH OTHER are not rebased here — compact()/delete()/
    * optimize() stay fail-on-conflict, as validating a rewrite-vs-
    * rewrite race needs row-level reasoning the public formats also
    * refuse at this isolation level.
    *
    * `beforeCommit` is a test seam: StreamingSpec injects a competing
    * commit between head-read and publish to force the retry path
    * deterministically (a wall-clock race cannot be pinned in a test).
    *
    * 100 TB posture: contention burns manifest METADATA round-trips
    * only — the staged data (the expensive distributed write) is
    * untouched across retries, so N concurrent ingest jobs serialize
    * at log-commit rate, not data rate. Returns the committed
    * version. */
  def appendWithRetry(s: SparkSession, root: String, df: DataFrame,
      nFiles: Int, maxAttempts: Int = 10,
      beforeCommit: () => Unit = () => ()): Long = {
    val staged = stageDataFiles(s, root, df, nFiles)
    var attempt = 0
    while (attempt < maxAttempts) {
      attempt += 1
      val prev = latestVersion(root)
      // validated per attempt: a competitor may have EVOLVED the
      // schema since the last read — the rebase must respect the head
      // it actually lands on
      requireSchemaCompatible(root, prev, df, "appendWithRetry")
      val prevFiles = prev.map(v => snapshotFiles(root, v)
        .map(p => relativize(root, p))).getOrElse(Nil)
      val (prevCol, prevStats) =
        prev.map(v => snapshotStatsOf(root, v)).getOrElse((None, Map.empty[String, (Long, Long)]))
      beforeCommit()
      try {
        return commit(root, prevFiles ++ staged, prev,
          statsCol = prevCol, stats = prevStats,
          schemaJson = carriedSchemaJson(root, prev))
      } catch {
        case _: java.util.ConcurrentModificationException => // rebase and retry
      }
    }
    throw new java.util.ConcurrentModificationException(
      s"appendWithRetry: gave up after $maxAttempts attempts under $root")
  }

  /** Range-cluster OPTIMIZE — the data-layout maintenance command of
    * the public formats (Delta OPTIMIZE ZORDER BY / Iceberg rewrite
    * with a sort order), single-column form: rewrite the CURRENT
    * snapshot so each file covers one contiguous `statsCol` range
    * (buckets = the intervals between `cutoffs`), and record per-file
    * min/max in the manifest. An ingest-ordered table's files each
    * span ~the whole key range (every selective scan reads every
    * file); after clustering, file bounds align with the ranges and
    * manifest-stats pruning starts to bite — layout is what makes the
    * skipping metadata EFFECTIVE, not just present. Bucket boundaries
    * are explicit integer cutoffs supplied by the caller (derived from
    * one scalar agg — metadata-grade), NOT a sampled RangePartitioner,
    * so file contents and bounds are deterministic and the key's file
    * accounting is oracle-checkable. Commits op="optimize": a
    * data-neutral rewrite, so changes() refuses file-diff ranges
    * across it exactly as it refuses compactions, and pinned readers
    * at earlier versions are untouched (rewrite-never-delete).
    *
    * 100 TB posture: each bucket stages as its own distributed write
    * (buckets are independent jobs — at cluster scale they run as one
    * partitionBy write or parallel jobs); the pruning payoff is read-
    * side and permanent. Returns the committed version. */
  def optimize(s: SparkSession, root: String, statsCol: String,
      cutoffs: Seq[Long], filesPerBucket: Int): Long = {
    import org.apache.spark.sql.functions.{col, lit}
    val prev = latestVersion(root)
      .getOrElse(sys.error(s"cannot optimize an empty table at $root"))
    // overlapping buckets would stage the same rows twice and publish a
    // row-duplicating commit under a data-neutral op
    require(cutoffs == cutoffs.sorted && cutoffs.distinct.size == cutoffs.size,
      s"optimize cutoffs must be strictly increasing, got $cutoffs")
    val cur = read(s, root, prev) // pinned: immune to concurrent commits
    val bounds = (None +: cutoffs.map(Some(_))).zip(cutoffs.map(Some(_)) :+ None)
    val staged = bounds.flatMap { case (lo, hi) =>
      // NULL keys route to the FIRST bucket (a range predicate is
      // null-rejecting, so without this a row with a NULL cluster key
      // would match no bucket and the "data-neutral rewrite" would
      // silently drop it); the bucket's file stats ignore nulls, which
      // stays safe — a range probe never matches NULL rows anyway
      val rangePred =
        lo.map(col(statsCol) > lit(_)).getOrElse(lit(true)) &&
          hi.map(col(statsCol) <= lit(_)).getOrElse(lit(true))
      val part = cur.filter(
        if (lo.isEmpty) col(statsCol).isNull || rangePred else rangePred)
      stageDataFiles(s, root, part, filesPerBucket)
    }
    commit(root, staged, Some(prev), op = "optimize",
      statsCol = Some(statsCol),
      stats = perFileStats(s, root, staged, statsCol),
      schemaJson = carriedSchemaJson(root, Some(prev)))
  }

  // ------------------------------------------------------------------
  // Manifest SEGMENTS — the million-file-table metadata step (r9):
  // the Iceberg manifest-list / manifest-file split. A segmented
  // version's manifest lists SEGMENT files (with per-segment file
  // count and aggregated column bounds), and each immutable segment
  // file under _graft_log/ holds the per-file entries (+ per-file
  // stats). Two scaling properties fall out by construction:
  //   - commit cost is O(new files), not O(table files): an append
  //     writes ONE new segment and copies only the prior SEGMENT
  //     REFERENCES (a few bytes each) into the next manifest — a
  //     10^6-file table's append touches one segment + a ~dozen-line
  //     manifest, never a million-entry listing;
  //   - planning prunes whole segments by their aggregated bounds
  //     BEFORE reading any per-file entry — metadata I/O at plan time
  //     scales with the SURVIVING segment count, and within a
  //     surviving segment the per-file stats prune again (the same
  //     two-level skip Iceberg runs: manifest-list bounds, then
  //     manifest entry bounds).
  // ------------------------------------------------------------------

  /** One segment reference as listed in a version manifest: the
    * segment file's name under _graft_log/, how many data files it
    * holds, and the aggregated [lo, hi] bounds of its stats column
    * (None = segment has stat-less files ⇒ unprunable). */
  final case class SegmentRef(path: String, nFiles: Int,
      bounds: Option[(Long, Long)])

  private def renderSegmentManifest(version: Long, op: String,
      segs: Seq[SegmentRef]): String =
    s"""{"version":$version,"op":"$op","segments":[""" +
      segs.map { sr =>
        val b = sr.bounds.map { case (lo, hi) => s""","lo":$lo,"hi":$hi""" }.getOrElse("")
        s"""{"path":"${sr.path}","nFiles":${sr.nFiles}$b}"""
      }.mkString(",") + "]}"

  /** The segment references of a segmented version's manifest. */
  def segmentsOf(root: String, version: Long): Seq[SegmentRef] = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(manifest(root, version).toPath))
    val segs = node.get("segments")
    require(segs != null, s"version $version under $root is not a segmented manifest")
    (0 until segs.size()).map { i =>
      val sn = segs.get(i)
      SegmentRef(sn.get("path").asText(), sn.get("nFiles").asInt(),
        if (sn.has("lo")) Some((sn.get("lo").asLong(), sn.get("hi").asLong())) else None)
    }
  }

  /** Read one immutable segment file: (relative data-file paths,
    * per-file stats). */
  def segmentEntries(root: String, segPath: String): (Seq[String], Map[String, (Long, Long)]) = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(
        new java.io.File(logDir(root), segPath).toPath))
    val files = node.get("files")
    val fs = (0 until files.size()).map(i => files.get(i).asText())
    val stats = Option(node.get("stats")).map { st =>
      val it = st.fields()
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val e = it.next()
        b += e.getKey -> (e.getValue.get(0).asLong(), e.getValue.get(1).asLong())
      }
      b.result()
    }.getOrElse(Map.empty)
    (fs, stats)
  }

  /** Stage `df` as `nFiles` data files, write them (with per-file
    * min/max stats on `statsCol`) as ONE new immutable segment file,
    * and commit a manifest listing the prior version's segment
    * references (copied verbatim — the segment files themselves are
    * never reopened or rewritten) plus the new one. */
  def appendSegment(s: SparkSession, root: String, df: DataFrame,
      nFiles: Int, statsCol: String): Long = {
    val prev = latestVersion(root)
    val prevSegs = prev.map(v => segmentsOf(root, v)).getOrElse(Nil)
    val staged = stageDataFiles(s, root, df, nFiles)
    val stats = perFileStats(s, root, staged, statsCol)
    logDir(root).mkdirs()
    val segName = "seg-" + java.util.UUID.randomUUID().toString + ".json"
    val segJson = s"""{"files":[${staged.map(f => "\"" + f + "\"").mkString(",")}],""" +
      s""""statsCol":"$statsCol","stats":{""" +
      stats.toSeq.sortBy(_._1).map { case (f, (lo, hi)) =>
        s""""$f":[$lo,$hi]""" }.mkString(",") + "}}"
    java.nio.file.Files.writeString(
      new java.io.File(logDir(root), segName).toPath, segJson)
    val bounds =
      if (stats.isEmpty) None
      else Some((stats.values.map(_._1).min, stats.values.map(_._2).max))
    val next = prev.map(_ + 1).getOrElse(0L)
    publish(root, next, renderSegmentManifest(next, "append",
      prevSegs :+ SegmentRef(segName, staged.size, bounds)))
    next
  }

  /** Two-level pruned scan of a segmented version: segments whose
    * aggregated bounds miss [lo, hi] are skipped WITHOUT reading their
    * per-file entries (plan-time metadata I/O ∝ surviving segments);
    * within a surviving segment the per-file stats prune again.
    * Stat-less segments/files are unprunable ⇒ always read. Returns
    * (df, segsTotal, segsRead, filesTotal, filesRead) — filesTotal
    * comes from the manifest's per-segment counts, so reporting it
    * costs no segment reads. Pruning is pure metadata: the caller
    * still applies its precise predicate. */
  def segmentedPrunedRead(s: SparkSession, root: String, version: Long,
      lo: Long, hi: Long): (DataFrame, Int, Int, Int, Int) = {
    val segs = segmentsOf(root, version)
    val live = segs.filter(_.bounds.forall { case (mn, mx) => mx >= lo && mn <= hi })
    val keep = live.flatMap { sr =>
      val (fs, stats) = segmentEntries(root, sr.path)
      fs.filter(f => stats.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi })
    }
    val df =
      if (keep.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          s.read.parquet(new java.io.File(root,
            segmentEntries(root, segs.head.path)._1.head).toString).schema)
      else s.read.parquet(keep.map(f => new java.io.File(root, f).toString): _*)
    (df, segs.size, live.size, segs.map(_.nFiles).sum, keep.size)
  }

  private def relativize(root: String, abs: String): String =
    new java.io.File(root).toPath.relativize(new java.io.File(abs).toPath).toString

  private def stageDataFiles(s: SparkSession, root: String,
      df: DataFrame, nFiles: Int): Seq[String] = {
    val stage = java.nio.file.Files.createTempDirectory(
      new java.io.File(root).toPath, ".stage-")
    df.repartition(nFiles).write.mode("overwrite").parquet(stage.toString)
    val dataDir = new java.io.File(root, "data"); dataDir.mkdirs()
    val parts = Option(stage.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val moved = parts.map { p =>
      val dst = new java.io.File(dataDir,
        java.util.UUID.randomUUID().toString + ".parquet")
      java.nio.file.Files.move(p.toPath, dst.toPath)
      "data/" + dst.getName
    }.toSeq
    // scrub the staging residue (an _SUCCESS marker and the empty dir)
    Option(stage.toFile.listFiles()).foreach(_.foreach(_.delete()))
    stage.toFile.delete()
    moved
  }
}
