package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table loader over the driver fixtures (TESTDATA.md:14-15).
  *
  * All fixture access funnels through here so the engine has ONE place
  * to swap storage layout (bucketed tables, partitioned dirs, a
  * catalog) when moving from local fixtures to a 100 TB lake.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memo of the LAZY per-table DataFrame (r19, guide §1.2 per-task /
    * §5 driver work): every `apply` used to run schema inference plus
    * a fresh InMemoryFileIndex listing — hundreds of plan-time
    * round-trips per full sweep for the same ten read-only fixtures.
    * This caches the unexecuted plan only (the Sql.registerViews
    * precedent): every action over it still scans parquet from disk,
    * so no result or intermediate is ever reused. Keyed on the
    * fixture's (mtime, length) identity so a DERIVED dir rewritten in
    * place within one session (ScaleSoak's scaled copies) never hits
    * a stale file list, and per-session via weak keys so a GC'd
    * session drops its entries. */
  private val frameMemo = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Long, Long), DataFrame]]())

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = new java.io.File(s"$sfDir/$name.parquet")
    val key = (p.getPath, p.lastModified(), p.length())
    val m = frameMemo.synchronized {
      var t = frameMemo.get(spark)
      if (t == null) {
        t = new scala.collection.concurrent.TrieMap[(String, Long, Long), DataFrame]()
        frameMemo.put(spark, t)
      }
      t
    }
    m.getOrElseUpdate(key,
      if (name == "events") events(spark, sfDir)
      else spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which the
    * vectorized Spark reader rejects. Read nanos as long (legacy conf)
    * and convert to a µs timestamp — lossless: the fixture's ns
    * component is verified zero (epoch_ns % 1000 == 0 for all rows),
    * and DuckDB's reader does the identical ns→µs conversion. */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    // Scope the legacy conf to this read: the nanosAsLong schema
    // conversion happens both at read (schema inference) and execution
    // (scan setup) time, so pin the per-read behavior via a DataSource
    // OPTION (options override the session conf in the scan's effective
    // hadoopConf) instead of mutating the shared session — a session-
    // wide true would silently turn every later TIMESTAMP(NANOS)
    // parquet read in unrelated code into BIGINT columns.
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.option(key, "true").parquet(s"$sfDir/events.parquet")
      raw.schema("ts").dataType match {
        // integral DIV, not `/`: long/long is double division in Spark
        // SQL and epoch-ns exceeds 2^53, so `/1000` rounds the µs.
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        // r8 fixtures store ts as µs WITHOUT tz annotation, which Spark
        // infers as TIMESTAMP_NTZ; the engine contract (and TimeSpec)
        // is an LTZ instant whose UTC wall clock equals the stored
        // value — the same instant the old TIMESTAMP(NANOS) fixtures
        // produced via timestamp_micros, and the same naive value
        // DuckDB's oracle reads. The NTZ→LTZ cast resolves against the
        // session time zone, which every graft entry point (Verify,
        // Bench, Explain, specs) pins to UTC.
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        // a DERIVED events dir (ScaleSoak's scaled copies, any
        // re-written staging) carries a plain µs LTZ timestamp already
        case _ => raw
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
