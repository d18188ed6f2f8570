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
      val c = Tables(s, dir, "customer").select(col("c_nationkey").as("nk"))
      val sup = Tables(s, dir, "supplier").select(col("s_nationkey").as("nk"))
      ordered(c.except(sup))
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
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin +
        orderByAll("nk"))
  )
}
