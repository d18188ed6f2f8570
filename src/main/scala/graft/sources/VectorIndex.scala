package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF vector index (r11, VERDICT item 3) —
  * the [[IncrementalView]] watermark pattern applied to the persisted
  * ANN index: the index is TWO commit-log tables under one root,
  *
  *   <root>/assigned   (vec_id, label, v, cell) PARTITIONED BY cell —
  *                     the posting lists; a probe reads nProbe cell
  *                     partitions via manifest partition pruning
  *   <root>/centroids  (cell, cv) — the coarse quantizer, FROZEN at
  *                     create time (version 0 is the codebook)
  *
  * and corpus APPENDS fold in by assigning only the NEW vectors
  * against the frozen centroids (a narrow broadcast-codebook map, no
  * corpus shuffle, no retrain) and appending their postings to the
  * matching cell partitions — refresh cost ∝ new rows, the FAISS
  * `add` operation expressed as log commits. The last indexed source
  * version rides the posting commit's own manifest (field `indexSrc`),
  * so the watermark advances atomically with the postings it covers
  * and an at-least-once replay folds nothing twice.
  *
  * Frozen centroids keep refresh exact-by-construction: the refreshed
  * index EQUALS a from-scratch assignment of the whole corpus against
  * the same codebook (asserted by the s_sim_index_refresh key), and
  * probe results follow. What freezing gives up is codebook drift —
  * after enough appends the cells no longer balance; that is the
  * public engines' answer too (FAISS adds to a trained index; retrain
  * is a deliberate rebuild, here `create` again).
  *
  * Row-REMOVING source commits are refused loudly (fold appends only,
  * rebuild across deletes): a deletion would need posting-list
  * tombstones the probe must mask — the merge-on-read design the
  * commit log already ships for tables, deliberately not duplicated
  * here until an operator needs it. */
object VectorIndex {

  private val SrcProp = "graft.index.sourceRoot"
  private val VerProp = "graft.index.sourceVersion"
  private val VerField = "indexSrc"

  def assignedRoot(indexRoot: String): String =
    new java.io.File(indexRoot, "assigned").toString
  def centroidsRoot(indexRoot: String): String =
    new java.io.File(indexRoot, "centroids").toString

  /** Narrow broadcast-codebook assignment against FROZEN centroids —
    * the exact argmin expression of Similarity.ivfTrain's assign step
    * (fixed-point l2_dist_q, ties by cell id), so an incremental
    * assignment can never disagree with a full one. */
  private[graft] def assignFrozen(e: DataFrame, cents: DataFrame): DataFrame = {
    graft.functions.VectorExprs.register(e.sparkSession)
    val packed = cents.agg(
      expr("array_sort(collect_list(struct(cell, cv)))").as("cs"))
    e.crossJoin(broadcast(packed))
      .withColumn("best", expr(
        "array_min(transform(cs, c -> named_struct(" +
          "'dq', l2_dist_q(v, c.cv), 'cell', c.cell)))"))
      .select(col("vec_id"), col("label"), col("v"),
        col("best.cell").as("cell"))
  }

  /** See IncrementalView.lastFolded — the same checkpoint-floored
    * walk, over the ASSIGNED table's `indexSrc` field. */
  private def lastIndexed(aRoot: String): Long =
    CommitLog.lastLongMeta(aRoot, VerField)
      .orElse(CommitLog.tableProperty(aRoot, VerProp).map(_.toLong))
      .getOrElse(sys.error(s"$aRoot is not a maintained vector index"))

  /** Persist a freshly-trained index over `srcRoot`@`srcVersion`:
    * `assigned` and `cents` are the trainer's outputs (the caller owns
    * the training recipe — Similarity.ivfTrain here). Returns the
    * assigned table's version 0. */
  def create(s: SparkSession, indexRoot: String, srcRoot: String,
      srcVersion: Long, assigned: DataFrame, cents: DataFrame): Long = {
    CommitLog.append(s, centroidsRoot(indexRoot), cents, nFiles = 1)
    val aRoot = assignedRoot(indexRoot)
    val v = CommitLog.appendPartitioned(s, aRoot, assigned, "cell",
      filesPerPartition = 1,
      extraMeta = Seq(s""","$VerField":$srcVersion"""))
    CommitLog.setTableProperty(aRoot, SrcProp, srcRoot)
    CommitLog.setTableProperty(aRoot, VerProp, srcVersion.toString)
    // one commit per refresh — checkpoint the history every 10th so
    // the watermark walk stays O(interval) on a long-lived index (r11)
    CommitLog.setTableProperty(aRoot, "checkpointInterval", "10")
    v
  }

  /** Fold corpus appends since the last refresh into the index.
    * Returns (assignedVersion, vectorsIndexed); a no-change refresh
    * publishes nothing. Refuses ranges containing row-removing
    * commits (delete/update/overwrite) — rebuild across those. */
  def refresh(s: SparkSession, indexRoot: String): (Long, Long) = {
    val aRoot = assignedRoot(indexRoot)
    val srcRoot = CommitLog.tableProperty(aRoot, SrcProp)
      .getOrElse(sys.error(s"$aRoot is not a maintained vector index (no $SrcProp)"))
    val from = lastIndexed(aRoot)
    val srcHead = CommitLog.latestVersion(srcRoot)
      .getOrElse(sys.error(s"source corpus vanished from $srcRoot"))
    val head = CommitLog.latestVersion(aRoot)
      .getOrElse(sys.error(s"index table vanished from $aRoot"))
    if (srcHead == from) return (head, 0L)
    // ONE pass over the changelog: localCheckpoint the new vectors,
    // then a scalar agg for (inserts, non-inserts, max version)
    val changes = CommitLog.changesRows(s, srcRoot, from, srcHead)
      .localCheckpoint()
    val sig = changes.agg(
      coalesce(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("_change_type") =!= "insert", 1L)
        .otherwise(0L)), lit(0L)),
      max(col("_commit_version"))).collect()(0)
    val (nIns, nOther) = (sig.getLong(0), sig.getLong(1))
    require(nOther == 0L,
      s"index refresh folds APPENDS only; versions ($from, $srcHead] " +
        "contain row-removing changes — rebuild the index with create()")
    if (nIns == 0L) return (head, 0L)
    val maxVer = sig.getLong(2)
    val cents = CommitLog.read(s, centroidsRoot(indexRoot),
      CommitLog.latestVersion(centroidsRoot(indexRoot)).get)
    val fresh = assignFrozen(
      changes.select(col("vec_id"), col("label"), col("v")), cents)
    val v = CommitLog.appendPartitioned(s, aRoot, fresh, "cell",
      filesPerPartition = 1,
      extraMeta = Seq(s""","$VerField":$maxVer"""))
    // best-effort backstop for vacuumed fold manifests, like the views
    CommitLog.setTableProperty(aRoot, VerProp, maxVer.toString)
    (v, nIns)
  }
}
