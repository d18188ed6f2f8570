package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B4 (cont.) — rollup / cube / grouping sets over nation×segment.
  *
  * grouping() flags (0/1 per column, cast to INT both sides) are used
  * instead of grouping_id() — bit order of the packed id is engine-
  * specific, the per-column flag is standard SQL.
  *
  * Scale: Spark plans these as a single Expand + hash aggregate —
  * one shuffle regardless of the number of grouping sets. */
object Grouping {

  private def base(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_mktsegment"), col("c_acctbal"))

  private def aggs = Seq(
    count(lit(1)).as("n_cust"),
    dsum(col("c_acctbal")).as("sum_bal"),
    grouping(col("n_name")).cast("int").as("g_nation"),
    grouping(col("c_mktsegment")).cast("int").as("g_seg"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_rollup" -> { (s, dir) =>
      ordered(base(s, dir).rollup(col("n_name"), col("c_mktsegment"))
        .agg(aggs.head, aggs.tail: _*))
    },
    "q_agg_cube" -> { (s, dir) =>
      ordered(base(s, dir).cube(col("n_name"), col("c_mktsegment"))
        .agg(aggs.head, aggs.tail: _*))
    },
    "q_agg_grouping_sets" -> { (s, dir) =>
      val b = base(s, dir)
      ordered(b.groupingSets(
          Seq(Seq(col("n_name")), Seq(col("c_mktsegment")), Seq()),
          col("n_name"), col("c_mktsegment"))
        .agg(aggs.head, aggs.tail: _*))
    }
  )

  private def oracleFor(clause: String): String =
    s"""SELECT n_name, c_mktsegment, COUNT(*) AS n_cust,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
       |  CAST(GROUPING(n_name) AS INT) AS g_nation,
       |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY $clause""".stripMargin +
      orderByAll("n_name", "c_mktsegment", "n_cust", "sum_bal", "g_nation", "g_seg")

  def oracle: Map[String, String] = Map(
    "q_agg_rollup" -> oracleFor("ROLLUP (n_name, c_mktsegment)"),
    "q_agg_cube" -> oracleFor("CUBE (n_name, c_mktsegment)"),
    "q_agg_grouping_sets" ->
      oracleFor("GROUPING SETS ((n_name), (c_mktsegment), ())")
  )
}
