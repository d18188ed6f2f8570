package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** `transformWithState` twin of [[StatefulSession]] — the Spark 4.x
  * successor API for custom streaming state (SURVEY.md §2 B9
  * s_stateful_session_tws): explicit named state slots, first-class
  * timers (register/delete, many per key), state TTL, and a
  * RocksDB-native store contract, vs `flatMapGroupsWithState`'s single
  * implicit state value + one timeout.
  *
  * Semantics are IDENTICAL to [[StatefulSession]] by construction
  * (same merge fold, same gap rule, same emit-on-close), and
  * StreamingSpec asserts row equality of the two keys' outputs on
  * watermark-closed sessions — the API-migration safety net a
  * production pipeline wants before switching.
  *
  * Timer discipline (the real API difference): fMGWS's
  * setTimeoutTimestamp REPLACES the previous timeout; tws timers
  * ACCUMULATE. Extending a session therefore deletes the superseded
  * timer, and the expiry handler double-checks the firing timer still
  * matches the current session end — a stale timer (deleted-timer
  * delete is best-effort across restarts) can then never close a
  * live session early.
  *
  * 100 TB posture: identical to the fMGWS twin — state per active user
  * within the watermark horizon, hash-partitioned; transformWithState
  * requires the RocksDB state-store provider (the large-keyspace
  * config), which the query key scopes around its run.
  */
object StatefulSessionTws {
  import StatefulSession.{Ev, SessState, SessionOut, GapMs}

  class SessionProcessor extends StatefulProcessor[Long, Ev, SessionOut] {
    @transient private var state: ValueState[SessState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessState]("sess",
        Encoders.product[SessState], TTLConfig.NONE)

    private def close(userId: Long, s: SessState) = SessionOut(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
      s.n, s.sum)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[SessionOut] = {
      // deterministic in-batch order regardless of shuffle arrival
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = if (state.exists()) Option(state.get()) else None
      val prevEnd = cur.map(_.last + GapMs)
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= GapMs =>
            cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(key, s)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        val end = s.last + GapMs
        if (!prevEnd.contains(end)) {
          prevEnd.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(end)
        }
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      // only a timer matching the CURRENT session end may close it
      if (state.exists() && state.get().last + GapMs == info.getExpiryTimeInMs) {
        val out = close(key, state.get())
        state.clear()
        Iterator.single(out)
      } else Iterator.empty
    }
  }

  /** Apply over a watermarked stream of events. */
  def sessions(events: Dataset[Ev]): Dataset[SessionOut] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[SessionOut] =
      Encoders.product[SessionOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
