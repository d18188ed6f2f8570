package graft.plans

import org.apache.spark.sql.DataFrame

/** Stable identity string for memoizing materialized intermediate
  * tables (Dedup's shingle/pair tables, Similarity's scored pairs).
  *
  * Why not the canonicalized plan string alone: leaf nodes erase their
  * data identity when printed — `LogicalRelation`'s string is just
  * "Relation [cols] parquet" (NO file path, so the same projection
  * over /sf0.001 and /sf0.01 collides), and `LocalRelation` prints
  * only its schema (every test-generated dataset collides). A memo
  * keyed that way silently serves one dataset's materialization for
  * another — exactly the class of bug the r3 review flagged for
  * 32-bit semanticHash keys, surfaced for real when a spec looped two
  * scale dirs through the blocked-pairs memo.
  *
  * Contract: `of` returns Some(key) only when EVERY leaf's identity is
  * established exactly (file roots for parquet/orc/csv relations, full
  * row rendering for local data, RDD id for checkpointed inputs);
  * otherwise None, and the caller must compute uncached — correctness
  * never depends on the memo firing. */
object PlanKey {
  def of(df: DataFrame): Option[String] = {
    val plan = df.queryExecution.analyzed
    val ids = plan.collectLeaves().map {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some("files:" + fs.location.rootPaths.mkString(","))
          case _ => None
        }
      case loc: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        // exact data rendering, not a hash: a silent collision would
        // serve the wrong table; local inputs are test-sized
        Some(s"local:${loc.data.length}:${loc.data.mkString("|")}")
      case r: org.apache.spark.sql.catalyst.plans.logical.Range =>
        Some("range:" + r.toString)
      case rdd: org.apache.spark.sql.execution.LogicalRDD =>
        Some("rdd:" + rdd.rdd.id)
      case _ => None
    }
    if (ids.contains(None)) None
    else Some(plan.canonicalized.toString + "|" + ids.flatten.mkString(";"))
  }
}
