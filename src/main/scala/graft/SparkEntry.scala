package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each operator family lives in graft.operators.*; this object is the
  * registry the driver's Verify/Bench harness consumes. */
object SparkEntry {
  private[graft] def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (Scans.queries, Scans.oracle),
      (Decode.queries, Decode.oracle),
      (Joins.queries, Joins.oracle),
      (Aggregates.queries, Aggregates.oracle),
      (Grouping.queries, Grouping.oracle),
      (Quality.queries, Quality.oracle),
      (Windows.queries, Windows.oracle),
      (Scalars.queries, Scalars.oracle),
      (SortsSets.queries, SortsSets.oracle),
      (Time.queries, Time.oracle),
      (Text.queries, Text.oracle),
      (Dedup.queries, Dedup.oracle),
      (Embeddings.queries, Embeddings.oracle),
      (Similarity.queries, Similarity.oracle),
      (Graph.queries, Graph.oracle),
      (Multimodal.queries, Multimodal.oracle),
      (Sql.queries, Sql.oracle),
      (Extensibility.queries, Extensibility.oracle),
      (TableFormat.queries, TableFormat.oracle),
      (Streams.queries, Streams.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
