package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful per-user sessionization with event-time timeout
  * (SURVEY.md §2 B9 s_stateful_session): the custom-state path that
  * `session_window` can't express (per-session custom payloads,
  * emit-on-close semantics) — `flatMapGroupsWithState` over
  * `KeyValueGroupedDataset`.
  *
  * Semantics: events for a user belong to one session while gaps stay
  * ≤ 30 min; a session closes (and is emitted exactly once) when the
  * watermark passes its last event + 30 min (event-time timeout), or
  * when a later in-batch event opens the next session.
  *
  * 100 TB posture: state is per-user (bounded by active users within
  * the watermark horizon, not by history); partitioned by user_id
  * across executors; RocksDB state store is the documented config for
  * large keyspaces (`spark.sql.streaming.stateStore.providerClass`).
  */
object StatefulSession {
  val GapMs: Long = 30 * 60 * 1000L

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Merge a batch of events for one user into session state. */
  def updateUser(userId: Long, events: Iterator[Ev],
      state: GroupState[SessState]): Iterator[SessionOut] = {
    def close(s: SessState) = SessionOut(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
      s.n, s.sum)
    if (state.hasTimedOut) {
      val out = state.getOption.map(close).toList
      state.remove()
      out.iterator
    } else {
      // deterministic in-batch order regardless of shuffle arrival
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.last <= GapMs =>
            cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(s)
            cur = Some(SessState(t, t, 1, e.value))
          case None =>
            cur = Some(SessState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + GapMs)
      }
      closed.result().iterator
    }
  }

  /** Apply over a watermarked stream of events. */
  def sessions(events: Dataset[Ev]): Dataset[SessionOut] =
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateUser)(Encoders.product[SessState], Encoders.product[SessionOut])
}
