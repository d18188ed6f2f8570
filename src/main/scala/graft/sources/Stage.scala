package graft.sources

/** Shared fixture-staging helper: materialize a derived copy of a
  * fixture table (re-encoded JSON, CSV, parquet dir) under /tmp once
  * per MACHINE, keyed by sfDir — and re-stage when the source fixture
  * is newer than the staged copy's _SUCCESS marker, so a regenerated
  * fixture is never served stale to the format-scan keys while the
  * oracle reads the fresh parquet.
  */
object Stage {

  /** Returns the staged directory, running `write` first iff the
    * staged copy is absent or older than `$sfDir/$sourceTable.parquet`.
    * `write` must produce a Hadoop-style _SUCCESS marker (any
    * `df.write` does). */
  def once(sfDir: String, name: String, sourceTable: String)(
      write: String => Unit): String = {
    val staged = s"/tmp/graft_stage/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"
    val marker = new java.io.File(staged, "_SUCCESS")
    val src = new java.io.File(sfDir, s"$sourceTable.parquet")
    if (!marker.exists() ||
        (src.exists() && src.lastModified() > marker.lastModified()))
      write(staged)
    staged
  }
}
