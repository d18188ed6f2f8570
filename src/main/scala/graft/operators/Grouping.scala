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
    "q_agg_pivot" -> { (s, dir) =>
      // pivot with an EXPLICIT value list (required at scale: an
      // implicit pivot collects the distinct values to the driver
      // first); plans as a single hash agg over conditional aggregates
      val o = Tables(s, dir, "orders")
      val p = o.groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("tp"))
      ordered(p.select(col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_tp").as("f_tp"),
        coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_tp").as("o_tp"),
        coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_tp").as("p_tp")))
    },
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
       |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_bal,
       |  CAST(GROUPING(n_name) AS INT) AS g_nation,
       |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY $clause""".stripMargin +
      orderByAll("n_name", "c_mktsegment", "n_cust", "sum_bal", "g_nation", "g_seg")

  private def pivotCell(st: String): String =
    s"""COUNT(*) FILTER (o_orderstatus = '$st') AS ${st.toLowerCase}_n,
       |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) FILTER (o_orderstatus = '$st') AS VARCHAR) AS DOUBLE) AS ${st.toLowerCase}_tp""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_agg_pivot" ->
      (s"""SELECT o_orderpriority,
        |  ${pivotCell("F")},
        |  ${pivotCell("O")},
        |  ${pivotCell("P")}
        |FROM orders GROUP BY o_orderpriority""".stripMargin +
        orderByAll("o_orderpriority", "f_n", "f_tp", "o_n", "o_tp", "p_n", "p_tp")),
    "q_agg_rollup" -> oracleFor("ROLLUP (n_name, c_mktsegment)"),
    "q_agg_cube" -> oracleFor("CUBE (n_name, c_mktsegment)"),
    "q_agg_grouping_sets" ->
      oracleFor("GROUPING SETS ((n_name), (c_mktsegment), ())")
  )
}
