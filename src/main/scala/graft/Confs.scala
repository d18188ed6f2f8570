package graft

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides — the ONE implementation of the
  * save → set → run → restore pattern used by keys that need a
  * planning-time conf different from the session's batch tuning
  * (bloom-filter thresholds, graph-sized shuffle fan-out, streaming
  * state-store fan-out). Keys that were unset before are unset again
  * on exit, not pinned to a read-back default; restore runs even when
  * `body` (or a later set) throws, because the saved snapshot covers
  * every key up front.
  *
  * Scope caveat (same as the call sites always documented): Spark
  * reads most sql confs at PLANNING/JOB-SUBMIT time, so anything lazy
  * that should see the override must be forced inside `body`
  * (e.g. `df.queryExecution.executedPlan`, an action, or an eager
  * checkpoint) — a DataFrame merely CONSTRUCTED here re-plans under
  * the restored confs when it finally runs.
  */
object Confs {
  def withConfs[A](s: SparkSession, kvs: (String, String)*)(body: => A): A = {
    val saved = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    try {
      kvs.foreach { case (k, v) => s.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
