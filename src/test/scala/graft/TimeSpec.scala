package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{EventSource, Tables}

/** Time-windowing semantics (SURVEY.md §2 B9): the lag-based batch
  * sessionization must agree with Spark's native `session_window`, and
  * the file-stream ingestion must behave identically when split into
  * many micro-batches. */
class TimeSpec extends SparkSpec {

  test("batch sessionize agrees with native session_window") {
    val e = Tables(spark, sf, "events")
    // The two formulations differ only on EXACT gap==30min boundaries
    // (lag-based keeps gap<=30min together; session_window merges
    // strictly-less). Guard that the fixture has no such gap.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val boundaryGaps = e.withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("ts").cast("long") - col("prev").cast("long") === 1800L).count()
    assume(boundaryGaps == 0, "fixture has exact-30min gaps; semantics diverge")

    val ours = SparkEntry.queries("q_sessionize")(spark, sf)
      .select(col("user_id"), col("session_start").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val native = e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").cast("long"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ours === native)
  }

  test("events read scopes the nanosAsLong conf and still executes after restore") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    val e = Tables(spark, sf, "events")
    // getOption reports the session default ("false") when unset — the
    // guard is that the read did not leave "true" behind
    assert(spark.conf.getOption(key) !== Some("true"),
      "events read leaked nanosAsLong=true into the shared session")
    // execution AFTER the conf restore must still read the NANOS file
    assert(e.count() > 0)
    assert(e.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("q_time_autocorr matches an independent in-memory Pearson replay (r8)") {
    import org.apache.spark.sql.functions._
    // recompute the quantized daily series and all three lag
    // correlations in plain Scala off the raw events — catches drift
    // in the quantization, lag pairing, or the moment formula
    val raw = Tables(spark, sf, "events")
      .select(col("event_type"), expr("CAST(ts AS LONG)").as("sec"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1) / 86400 * 86400,
        BigDecimal(r.getDouble(2)).setScale(4, BigDecimal.RoundingMode.HALF_UP)))
    val daily = raw.groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum.setScale(0, BigDecimal.RoundingMode.FLOOR).toLong)
      .toMap
    val expected = (for {
      typ <- daily.keys.map(_._1).toSeq.distinct
      k <- 1 to 3
    } yield {
      val xs = daily.filter(_._1._1 == typ).toSeq.sortBy(_._1._2).map(_._2)
      val pairs = xs.drop(k).zip(xs.dropRight(k)) // (x_t, x_{t-k})
      val n = pairs.size.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val (sxx, syy, sxy) = (pairs.map(p => p._1 * p._1).sum,
        pairs.map(p => p._2 * p._2).sum, pairs.map(p => p._1 * p._2).sum)
      val (va, vb) = (n * sxx - sx * sx, n * syy - sy * sy)
      val r = if (va > 0 && vb > 0)
        Some((n * sxy - sx * sy).toDouble / (math.sqrt(va.toDouble) * math.sqrt(vb.toDouble)))
      else None
      (typ, k.toLong) -> (n, r)
    }).toMap
    val got = SparkEntry.queries("q_time_autocorr")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        (r.getAs[Long]("n"), Option(r.get(r.fieldIndex("autocorr")))
          .map(_.asInstanceOf[Double]))).toMap
    assert(got.keySet === expected.filter(_._2._1 > 0).keySet)
    got.foreach { case (key, (n, r)) =>
      val (en, er) = expected(key)
      assert(n === en, s"$key: n $n vs $en")
      assert(r === er, s"$key: r $r vs replay $er")
      r.foreach(v => assert(v >= -1.0000001 && v <= 1.0000001, s"$key out of [-1,1]: $v"))
    }
  }

  test("q_time_cusum: prefix-sum/running-min identity equals the textbook recursion (r8)") {
    import org.apache.spark.sql.functions._
    // replay S+_t = max(0, S+_{t-1} + (x-mu-k)) and the mirrored S-
    // directly in Scala and demand equality with the window identity
    val rows = SparkEntry.queries("q_time_cusum")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"),
        r.getAs[Long]("x"), r.getAs[Long]("mu"),
        r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (typ, rs) =>
      val sorted = rs.sortBy(_._2)
      val mu = sorted.head._4
      val k = mu / 20
      var sp = 0L; var sn = 0L
      sorted.foreach { case (_, day, x, _, gotP, gotN) =>
        sp = math.max(0L, sp + (x - mu - k))
        sn = math.max(0L, sn + (mu - k - x))
        assert(gotP === sp, s"$typ day $day: s_pos $gotP != recursion $sp")
        assert(gotN === sn, s"$typ day $day: s_neg $gotN != recursion $sn")
      }
    }
  }

  test("kill mid-stream, resume from checkpoint: no loss, no dupes (A4/A5)") {
    val staged = EventSource.stageEvents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_kill_out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_kill_ck").toString
    def start() = spark.readStream
      .schema(Tables(spark, sf, "events").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    // run 1: stop as soon as at least one batch has committed ("crash")
    val q1 = start()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (q1.recentProgress.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    q1.stop()
    // run 2: resume from the same checkpoint to completion
    val q2 = start()
    q2.awaitTermination()
    val streamed = spark.read.parquet(out)
    val batch = Tables(spark, sf, "events")
    assert(streamed.count() === batch.count(), "lost or duplicated rows across the restart")
    assert(streamed.select(countDistinct(col("event_id"))).collect()(0).getLong(0) ===
      batch.count(), "duplicate event_ids after resume")
  }

  test("multi-batch ingestion (maxFilesPerTrigger=1) equals single-batch totals") {
    val staged = EventSource.stageEvents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft_mb_out").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_mb_ck").toString
    val q = spark.readStream
      .schema(Tables(spark, sf, "events").schema)
      .option("maxFilesPerTrigger", "1") // A9 fetch-limit analog
      .parquet(staged)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val batch = Tables(spark, sf, "events")
    assert(streamed.count() === batch.count())
    assert(streamed.select(sum(col("event_id"))).collect()(0).getLong(0) ===
      batch.select(sum(col("event_id"))).collect()(0).getLong(0))
    // offset log advanced once per file (4 staged files)
    val offsets = new java.io.File(s"$ck/offsets").listFiles()
    assert(offsets != null && offsets.length >= 4, s"expected >=4 micro-batches")
  }
}
