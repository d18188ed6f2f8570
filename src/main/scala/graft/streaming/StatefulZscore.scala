package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rolling z-score anomaly flag — the online twin of
  * q_time_anomaly (SURVEY.md §2 B9): per event type, maintain the
  * trailing window of daily value totals and emit each day's z-score
  * once the watermark closes that day. Custom state because no built-in
  * streaming aggregate can look ACROSS window buckets (the z of day N
  * needs the 6 preceding days' totals).
  *
  * Exactness discipline (must be BIT-equal to the batch twin, asserted
  * in StreamingSpec): day sums are kept as scale-4 longs produced by
  * the same HALF_UP decimal cast Spark's `CAST(value AS DECIMAL(18,4))`
  * performs (`new BigDecimal(double)` is the exact binary expansion);
  * sum-of-squares is exact BigDecimal arithmetic (a scaled-long product
  * would overflow Int64 at sf ≥ 0.1); each double is produced by ONE
  * correctly-rounded conversion (`BigDecimal.doubleValue`), then the
  * z formula is the identical IEEE op sequence the batch key runs.
  *
  * 100 TB posture: state per event type is 6 closed + open day totals
  * (a few hundred bytes), partitioned by type across executors;
  * emission is exactly-once per (type, day) via the emittedMax
  * watermark-ordered cursor. Late events below the watermark are
  * dropped by the engine before this operator sees them — same drop
  * rule the batch twin's input contract assumes.
  */
object StatefulZscore {
  import StatefulSession.Ev

  private val DayMs = 86400L * 1000L

  case class DaySum(bucket: Long, sumScaled: Long)
  case class ZState(days: List[DaySum], emittedMax: Long)
  case class ZOut(event_type: String, bucket: Long, x: Double, z: Double,
      is_anomaly: Boolean)

  /** Exact twin of Spark's double → DECIMAL(18,4) cast, as a scale-4
    * long. Spark's `Decimal.apply(double)` parses `Double.toString(d)`
    * — the SHORTEST decimal rendering — before rounding HALF_UP
    * (verified against spark-sql 4.1.2 bytecode), so this must use
    * `BigDecimal.valueOf` (same toString hop), NOT
    * `new BigDecimal(d)`: the exact binary expansion rounds
    * 2.00005 (stored as 2.0000499…) down to 2.0000 where Spark's
    * cast yields 2.0001. */
  private def scale4(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def updateType(tpe: String, events: Iterator[Ev],
      state: GroupState[ZState]): Iterator[ZOut] = {
    val prev = state.getOption.getOrElse(ZState(Nil, Long.MinValue))
    val m = scala.collection.mutable.LongMap[Long]()
    prev.days.foreach(d => m(d.bucket) = d.sumScaled)
    events.foreach { e =>
      val b = e.ts.getTime / DayMs * 86400L // epoch-second day bucket
      m(b) = m.getOrElse(b, 0L) + scale4(e.value)
    }
    val days = m.toList.map { case (b, s) => DaySum(b, s) }.sortBy(_.bucket)
    val wm = state.getCurrentWatermarkMs()
    val out = List.newBuilder[ZOut]
    var emittedMax = prev.emittedMax
    days.zipWithIndex.foreach { case (d, i) =>
      val dayClosed = (d.bucket + 86400L) * 1000L <= wm
      if (i >= 6 && d.bucket > emittedMax && dayClosed) {
        val win = days.slice(i - 6, i + 1)
        val sxL = win.iterator.map(_.sumScaled).sum // ≤ 7×(18,4): no overflow
        // squares overflow Int64 past sf0.1 — exact BigDecimal instead
        val sxxBD = win.iterator.map { w =>
          val b = java.math.BigDecimal.valueOf(w.sumScaled, 4)
          b.multiply(b)
        }.reduce(_.add(_))
        val x = java.math.BigDecimal.valueOf(d.sumScaled, 4).doubleValue()
        val sx = java.math.BigDecimal.valueOf(sxL, 4).doubleValue()
        val sxx = sxxBD.doubleValue()
        // clamp: (sxx - sx²/7)/6 can round to a tiny NEGATIVE double
        // for a constant window (≈27% of equal-value windows measured)
        // — unclamped, Spark yields sd=NaN (z=NaN, NaN>2 ⇒ true) while
        // DuckDB ERRORS on sqrt(negative); all three implementations
        // clamp identically so constant windows give z=0 everywhere
        val sd = math.sqrt(math.max((sxx - sx * sx / 7.0) / 6.0, 0.0))
        val z = if (sd == 0.0) 0.0 else (x - sx / 7.0) / sd
        out += ZOut(tpe, d.bucket, x, z, math.abs(z) > 2.0)
        emittedMax = d.bucket
      }
    }
    // bounded state: 6 most recent closed days (future windows need
    // them) + every still-open day
    val (done, pending) = days.partition(_.bucket <= emittedMax)
    state.update(ZState(done.takeRight(6) ++ pending, emittedMax))
    out.result().iterator
  }

  /** Apply over a watermarked stream of events. */
  def zscores(events: Dataset[Ev]): Dataset[ZOut] =
    events.groupByKey(_.event_type)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        updateType)(Encoders.product[ZState], Encoders.product[ZOut])
}
