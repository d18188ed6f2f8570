package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF vector index (r11, VERDICT item 3) —
  * the [[IncrementalView]] watermark pattern applied to the persisted
  * ANN index. The index is THREE commit-log tables under one root:
  *
  *   <root>/assigned    (vec_id, label, v, cell, gen) PARTITIONED BY
  *                      cell — the posting lists; a probe reads nProbe
  *                      cell partitions via manifest partition
  *                      pruning. `gen` is the source version whose
  *                      fold added the posting.
  *   <root>/centroids   (cell, cv) — the coarse quantizer, FROZEN at
  *                      create time (version 0 is the codebook).
  *   <root>/tombstones  (vec_id, gen) — merge-on-read DELETE masks:
  *                      a posting is dead iff a tombstone for its
  *                      vec_id carries a HIGHER generation (so a
  *                      re-inserted or updated vector's new posting
  *                      stays live while its older ones die) — the
  *                      deletion-vector design applied to postings.
  *
  * Corpus APPENDS fold by assigning only the NEW vectors against the
  * frozen centroids (a narrow broadcast-codebook map, no retrain, no
  * corpus rescan) and appending their postings to the matching cell
  * partitions — FAISS `add` as log commits. Corpus DELETES (and the
  * delete half of updates) fold as tombstone appends — cost ∝ deleted
  * rows, zero posting rewrites — and [[postings]] masks them at read
  * time with one anti join; [[purge]] is the REORG APPLY (PURGE)
  * twin: rewrite the postings without their dead rows and clear the
  * tombstones. The last indexed source version rides the posting
  * commit's own manifest (field `indexSrc`), atomic with the postings
  * it covers; tombstone appends land BEFORE the watermark commit, and
  * a crash between them replays as duplicate tombstone rows — masking
  * is an exists-style anti join, so duplicates are semantically inert
  * (idempotent by construction, not by bookkeeping).
  *
  * Frozen centroids keep maintenance exact-by-construction: the
  * maintained index EQUALS a from-scratch assignment of the live
  * corpus against the same codebook (the s_sim_index_refresh /
  * s_sim_index_delete keys pin both directions), and probe results
  * follow. What freezing gives up is codebook drift — after enough
  * churn the cells no longer balance; that is the public engines'
  * answer too (FAISS add/remove on a trained index; retrain is a
  * deliberate rebuild, here `create` again). */
object VectorIndex {

  private val SrcProp = "graft.index.sourceRoot"
  private val VerProp = "graft.index.sourceVersion"
  private val VerField = "indexSrc"

  def assignedRoot(indexRoot: String): String =
    new java.io.File(indexRoot, "assigned").toString
  def centroidsRoot(indexRoot: String): String =
    new java.io.File(indexRoot, "centroids").toString
  def tombstonesRoot(indexRoot: String): String =
    new java.io.File(indexRoot, "tombstones").toString

  /** Narrow broadcast-codebook assignment against FROZEN centroids —
    * the exact argmin expression of Similarity.ivfTrain's assign step
    * (fixed-point l2_dist_q, ties by cell id), so an incremental
    * assignment can never disagree with a full one. */
  private[graft] def assignFrozen(e: DataFrame, cents: DataFrame,
      carry: Seq[String] = Nil): DataFrame = {
    graft.functions.VectorExprs.register(e.sparkSession)
    val packed = cents.agg(
      expr("array_sort(collect_list(struct(cell, cv)))").as("cs"))
    e.crossJoin(broadcast(packed))
      .withColumn("best", expr(
        "array_min(transform(cs, c -> named_struct(" +
          "'dq', l2_dist_q(v, c.cv), 'cell', c.cell)))"))
      .select((Seq(col("vec_id"), col("label"), col("v"),
        col("best.cell").as("cell")) ++ carry.map(col)): _*)
  }

  /** See IncrementalView.lastFolded — the same checkpoint-floored
    * walk, over the ASSIGNED table's `indexSrc` field. */
  private def lastIndexed(aRoot: String): Long =
    // MAX of the two sources (r11 review — see IncrementalView
    // .lastFolded): a stale checkpoint answer behind the property
    // backstop would re-append duplicate postings
    (CommitLog.lastLongMeta(aRoot, VerField).toSeq ++
      CommitLog.tableProperty(aRoot, VerProp).map(_.toLong).toSeq)
      .maxOption
      .getOrElse(sys.error(s"$aRoot is not a maintained vector index"))

  /** Persist a freshly-trained index over `srcRoot`@`srcVersion`:
    * `assigned` and `cents` are the trainer's outputs (the caller owns
    * the training recipe — Similarity.ivfTrain here). Returns the
    * assigned table's version 0. */
  def create(s: SparkSession, indexRoot: String, srcRoot: String,
      srcVersion: Long, assigned: DataFrame, cents: DataFrame): Long = {
    CommitLog.append(s, centroidsRoot(indexRoot), cents, nFiles = 1)
    val aRoot = assignedRoot(indexRoot)
    val v = CommitLog.appendPartitioned(s, aRoot,
      assigned.withColumn("gen", lit(srcVersion)), "cell",
      filesPerPartition = 1,
      extraMeta = Seq(s""","$VerField":$srcVersion"""))
    CommitLog.setTableProperty(aRoot, SrcProp, srcRoot)
    CommitLog.setTableProperty(aRoot, VerProp, srcVersion.toString)
    // one commit per refresh — checkpoint the history every 10th so
    // the watermark walk stays O(interval) on a long-lived index (r11)
    CommitLog.setTableProperty(aRoot, "checkpointInterval", "10")
    v
  }

  /** The LIVE postings at the index head: the assigned table with
    * tombstoned generations masked out (one anti join against the
    * tombstone set — ∝ deleted rows until [[purge]] retires them).
    * Callers prune cells FIRST (partitionPrunedRead on `assigned`)
    * and mask the survivors via [[maskTombstones]] — this full-table
    * form exists for rebuild-equality checks and purge. */
  def postings(s: SparkSession, indexRoot: String): DataFrame =
    maskTombstones(s, indexRoot, CommitLog.read(s, assignedRoot(indexRoot),
      CommitLog.latestVersion(assignedRoot(indexRoot)).get))

  /** Mask `rows` (any subset of the assigned table — e.g. the probe's
    * cell-pruned candidates) against the current tombstone set: a
    * posting is dead iff a tombstone for its vec_id has a higher
    * generation. No tombstone table (or an emptied one) = no mask. */
  def maskTombstones(s: SparkSession, indexRoot: String,
      rows: DataFrame): DataFrame =
    CommitLog.latestVersion(tombstonesRoot(indexRoot))
      .filter(tv => CommitLog
        .snapshotFiles(tombstonesRoot(indexRoot), tv).nonEmpty) match {
      case None => rows // no tombstone table, or purged empty: no mask
      case Some(tv) =>
        val t = CommitLog.read(s, tombstonesRoot(indexRoot), tv)
          .select(col("vec_id").as("_t_vid"), col("gen").as("_t_gen"))
        rows.join(t,
          rows("vec_id") === t("_t_vid") && t("_t_gen") > rows("gen"),
          "left_anti")
    }

  /** Fold corpus changes since the last refresh into the index:
    * inserts (and update post-images) assign against the frozen
    * codebook and append postings; deletes (and update pre-images)
    * append tombstones. Returns (assignedVersion, vectorsIndexed,
    * vectorsTombstoned); a no-change refresh publishes nothing. */
  def refresh(s: SparkSession, indexRoot: String): (Long, Long, Long) = {
    val aRoot = assignedRoot(indexRoot)
    val srcRoot = CommitLog.tableProperty(aRoot, SrcProp)
      .getOrElse(sys.error(s"$aRoot is not a maintained vector index (no $SrcProp)"))
    val from = lastIndexed(aRoot)
    val srcHead = CommitLog.latestVersion(srcRoot)
      .getOrElse(sys.error(s"source corpus vanished from $srcRoot"))
    val head = CommitLog.latestVersion(aRoot)
      .getOrElse(sys.error(s"index table vanished from $aRoot"))
    if (srcHead == from) return (head, 0L, 0L)
    // ONE pass over the changelog: localCheckpoint the change rows,
    // then a scalar agg for (inserts, deletes, max version)
    val changes = CommitLog.changesRows(s, srcRoot, from, srcHead)
      .localCheckpoint()
    val pos = col("_change_type").isin("insert", "update_postimage")
    val sig = changes.agg(
      coalesce(sum(when(pos, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(!pos, 1L).otherwise(0L)), lit(0L)),
      max(col("_commit_version"))).collect()(0)
    val (nIns, nDel) = (sig.getLong(0), sig.getLong(1))
    if (nIns == 0L && nDel == 0L) return (head, 0L, 0L)
    val maxVer = sig.getLong(2)
    // tombstones FIRST, watermark-carrying posting commit SECOND: a
    // crash between them replays as duplicate tombstones — inert under
    // the exists-style mask (see the crash anatomy above)
    if (nDel > 0L) {
      // appendEvolved records the tombstone schema at v0, so a purged
      // (emptied) tombstone table still reads back as an empty relation
      CommitLog.appendEvolved(s, tombstonesRoot(indexRoot),
        changes.filter(!pos)
          .select(col("vec_id"), col("_commit_version").as("gen")),
        nFiles = 1)
    }
    val cents = CommitLog.read(s, centroidsRoot(indexRoot),
      CommitLog.latestVersion(centroidsRoot(indexRoot)).get)
    // ONE assignment kernel for create, rebuild and refresh
    // (assignFrozen — the exactness contract lives in one place);
    // per-row generations ride through as a carried column, so a
    // vector updated twice in one batch keeps only its newest posting
    val fresh = assignFrozen(
      changes.filter(pos).select(col("vec_id"), col("label"), col("v"),
        col("_commit_version").as("gen")),
      cents, carry = Seq("gen"))
    // an all-delete batch appends zero posting files — the commit
    // still publishes, carrying the watermark atomically
    val v = CommitLog.appendPartitioned(s, aRoot, fresh, "cell",
      filesPerPartition = 1,
      extraMeta = Seq(s""","$VerField":$maxVer"""))
    // best-effort backstop for vacuumed fold manifests, like the views
    CommitLog.setTableProperty(aRoot, VerProp, maxVer.toString)
    (v, nIns, nDel)
  }

  /** Physically retire the masked postings — the REORG APPLY (PURGE)
    * twin: overwrite the assigned table with its LIVE postings (one
    * routed cell-partitioned write), then empty the tombstone table.
    * A crash between the two leaves stale tombstones masking
    * already-purged generations — inert (nothing left to mask).
    * Returns (postingsPurged, tombstonesCleared). */
  def purge(s: SparkSession, indexRoot: String): (Long, Long) = {
    val aRoot = assignedRoot(indexRoot)
    val tRoot = tombstonesRoot(indexRoot)
    val nTomb = CommitLog.latestVersion(tRoot)
      .map(tv => CommitLog.read(s, tRoot, tv).count()).getOrElse(0L)
    if (nTomb == 0L) return (0L, 0L)
    val all = CommitLog.read(s, aRoot, CommitLog.latestVersion(aRoot).get)
    // materialize the masked set ONCE: the count and the overwrite's
    // staging read the checkpoint, not two more scan+anti-join passes
    val live = maskTombstones(s, indexRoot, all).localCheckpoint()
    val purged = all.count() - live.count()
    CommitLog.overwrite(s, aRoot, live, nFiles = 1, partCol = Some("cell"))
    CommitLog.delete(s, tRoot, lit(true))
    (purged, nTomb)
  }
}
