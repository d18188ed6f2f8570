package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B6 sorts/limits/top-k + B7 set operations (SURVEY.md §2).
  *
  * Scale notes: global top-k plans as TakeOrderedAndProject (per-
  * partition heap + driver merge of k rows, no full sort); the multi-
  * key sort is a range-partitioned exchange (sampled boundaries) —
  * both survive 100× scale. Set ops shuffle on the full row; the
  * distinct variants are hash-aggregates. */
object SortsSets {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sort IS the operator here: keep its (total) order, don't re-sort.
    "q_sort_multi" -> { (s, dir) =>
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"), col("c_name"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
                 col("c_acctbal").desc_nulls_last,
                 col("c_custkey").asc_nulls_first)
    },
    "q_limit_topk" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    },
    "q_union_all" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      val a = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("event_type"), col("value"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("event_type"), col("value"))
      ordered(a.union(b))
    },
    "q_union_distinct" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ordered(c.union(sup).distinct())
    },
    "q_intersect" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ordered(c.intersect(sup))
    },
    "q_except" -> { (s, dir) =>
      // the supplier side is RESTRICTED to nationkeys < 12 (r16,
      // VERDICT item 5): at every SF the unrestricted sides cover the
      // same nation set, so the except was vacuously empty — an
      // empty-vs-empty oracle comparison proves only emptiness. The
      // restriction makes the expected result the customers' nations
      // >= 12, non-empty at any scale.
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier")
        .filter(col("s_nationkey") < 12).select(col("s_nationkey").as("nk"))
      ordered(c.except(sup))
    },
    // Multiset (bag) set ops — INTERSECT ALL / EXCEPT ALL keep
    // per-value multiplicities (min / difference of counts). Spark
    // plans both as a count-pair hash aggregate + generate (replicate
    // row count times), NOT a join: one shuffle on the row value, and
    // the exchanged volume is distinct values + counts, so a 100×
    // duplication factor costs nothing extra at 100 TB.
    "q_intersect_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ordered(c.intersectAll(sup))
    },
    "q_except_all" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ordered(c.exceptAll(sup))
    },
    // Relational UNPIVOT (wide→long): melt the three per-returnflag
    // measure columns into (measure, val) rows. The unpivot itself is
    // a narrow Expand (each input row fans out to 3 rows in place, no
    // shuffle); the only exchange is the 4-group pre-aggregation.
    "q_unpivot" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val wide = li.groupBy(col("l_returnflag")).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
      ordered(wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "measure", "val"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT c_mktsegment, c_acctbal, c_custkey, c_name FROM customer
        |ORDER BY c_mktsegment ASC NULLS FIRST, c_acctbal DESC NULLS LAST,
        |  c_custkey ASC NULLS FIRST""".stripMargin,
    "q_limit_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_union_all" ->
      ("""SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
        |UNION ALL
        |SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'""".stripMargin +
        orderByAll("event_id", "event_type", "value")),
    "q_union_distinct" ->
      ("""SELECT c_nationkey AS nk FROM customer
        |UNION
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin +
        orderByAll("nk")),
    "q_intersect" ->
      ("""SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin +
        orderByAll("nk")),
    "q_except" ->
      ("""SELECT c_nationkey AS nk FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nk FROM supplier WHERE s_nationkey < 12""".stripMargin +
        orderByAll("nk")),
    "q_intersect_all" ->
      ("""SELECT c_nationkey AS nk FROM customer
        |INTERSECT ALL
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin +
        orderByAll("nk")),
    "q_except_all" ->
      ("""SELECT c_nationkey AS nk FROM customer
        |EXCEPT ALL
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin +
        orderByAll("nk")),
    "q_unpivot" ->
      ("""WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM w
        |UNION ALL SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM w
        |UNION ALL SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS val FROM w""".stripMargin +
        orderByAll("l_returnflag", "measure", "val"))
  )
}
