package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.Det._
import graft.sources.Tables

/** SQL front-end surface (SURVEY.md §2 note; the brief's
  * `spark.sql(...)` capability): fixture tables registered as temp
  * views, queries expressed as PORTABLE ANSI SQL — the SAME string is
  * submitted to Spark's SQL parser and to the DuckDB oracle, so these
  * keys also prove cross-engine SQL compatibility of the dialect
  * subset the engine emits (decimal-exact aggregation, timestamp
  * literals, CTEs, correlated EXISTS, window frames).
  *
  * 100 TB posture: identical to the DataFrame keys — SQL text and
  * DataFrame algebra meet in the same Catalyst logical plan (Q3 plans
  * broadcast dimension joins + partial aggs; EXISTS decorrelates to a
  * left-semi hash join, SURVEY.md §4.2).
  */
object Sql {

  /** Register fixture views once per (session, dir) — the three SQL
    * keys share one registration instead of re-reading all ten table
    * footers per invocation; switching dirs re-registers. Weak keys
    * (GC'd sessions drop their entry) and success-after marking (a
    * failed registration retries instead of poisoning the cache). */
  private val registered = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def registerViews(s: SparkSession, dir: String): Unit =
    if (registered.get(s) != dir) {
      Tables.all.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      registered.put(s, dir)
    }

  /** TPC-H-Q3-shaped: top-10 open-order revenue per (order, date,
    * priority) for one segment. */
  private val q3 =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1996-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey
      |LIMIT 10""".stripMargin

  /** TPC-H-Q1-shaped pricing summary (the canonical scan-heavy
    * aggregate; q_agg_group_pricing is its DataFrame twin). The
    * sum_charge triple product price·(1−disc)·(1+tax) CANNOT be three
    * chained DECIMAL(18,4) multiplies — the ideal result width (54)
    * exceeds both engines' 38-digit decimals (DuckDB errors, Spark
    * silently rounds under allowPrecisionLoss) — so the factors are
    * scaled to exact BIGINTs (×10⁴ each, integral by construction),
    * multiplied exactly (≤1.1e18 per row, inside int64), summed as
    * DECIMAL(38,0), and scaled back by 1e12 once. */
  private val q1 =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT) *
      |    (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)) *
      |    (10000 + CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT))
      |    AS DECIMAL(38,0))) AS STRING) AS DOUBLE) / 1e12 AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H-Q10-shaped: returned-item revenue per customer for one
    * half-year window, top 20 with a deterministic key tiebreak —
    * fact⋈two dims + broadcast nation, one agg shuffle, then a
    * TakeOrderedAndProject top-k. */
  private val q10 =
    """SELECT c_custkey, c_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  /** Correlated EXISTS — decorrelates to a left-semi join. */
  private val existsBig =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 400000.0)""".stripMargin

  /** CTE + running window over monthly totals (decimal-exact window
    * sum: DuckDB evaluates windowed aggregates with a segment tree,
    * so a DOUBLE running sum would be summation-order-dependent). */
  private val cteWindow =
    """WITH monthly AS (
      |  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS m_total
      |  FROM orders GROUP BY o_custkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP))
      |SELECT o_custkey, mon, m_total,
      |  CAST(CAST(SUM(CAST(m_total AS DECIMAL(18,4))) OVER (
      |    PARTITION BY o_custkey ORDER BY mon ROWS UNBOUNDED PRECEDING) AS STRING) AS DOUBLE) AS running_total,
      |  ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mon) AS rn
      |FROM monthly
      |WHERE o_custkey <= 100""".stripMargin

  /** TPC-H-Q5-shaped: revenue by supplier nation where the customer and
    * supplier share a nation, for two regions and a date range. Plans
    * as broadcast joins for all four dimension tables + ONE shuffle of
    * the lineitem fact for the final n_name agg — the canonical
    * star-schema shape at 100 TB. */
  private val q5 =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name IN ('ASIA', 'EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** TPC-H-Q18-shaped: large-quantity orders via an IN over a grouped
    * HAVING subquery — decorrelates to a semi join against the
    * aggregated fact (the aggregate, not the raw rows, crosses the
    * shuffle). Quantity compared in exact decimal on both engines. */
  private val q18 =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate""".stripMargin

  /** Correlated SCALAR subquery — per-nation max lookup in the WHERE
    * clause; Catalyst decorrelates it to a grouped aggregate joined
    * back on the correlation key (one dimension-sized agg + one equi
    * join — never a per-row re-scan of the inner table). Equality on
    * raw doubles is safe: both engines compare the identical stored
    * values, no arithmetic. */
  private val scalarSub =
    """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      |FROM supplier s
      |WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
      |                   WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin

  /** Recursive CTE (Spark 4.x `WITH RECURSIVE`, SPARK-24497): build a
    * 30-day date spine by recursion, then left-join daily event counts
    * so silent days surface as explicit zeros. The recursion runs on
    * the driver over 30 spine rows (UnionLoop); the heavy side is one
    * hash-agg shuffle of events + a broadcast of the spine — the
    * recursion depth, not the fact size, bounds the loop, so the same
    * plan holds at 100 TB of events. */
  private val recursiveSpine =
    """WITH RECURSIVE spine(d) AS (
      |  SELECT TIMESTAMP '2024-01-01 00:00:00'
      |  UNION ALL
      |  SELECT d + INTERVAL 1 DAY FROM spine
      |  WHERE d < TIMESTAMP '2024-01-30 00:00:00')
      |SELECT spine.d AS day, COALESCE(e.n_events, 0) AS n_events,
      |       COALESCE(e.n_users, 0) AS n_users
      |FROM spine LEFT JOIN (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |         COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
      |  FROM events GROUP BY CAST(date_trunc('day', ts) AS TIMESTAMP)) e
      |ON spine.d = e.day""".stripMargin

  /** LATERAL correlated subquery with ORDER BY + LIMIT — "top line item
    * per order". Catalyst decorrelates the limit-1 lateral into a
    * window top-1 (rank over l_orderkey) + equi join, NOT a per-outer-
    * row rescan of lineitem: one shuffle of each side on the order key,
    * which is exactly the hand-written plan at any scale. */
  private val lateralTop =
    """SELECT o.o_orderkey, o.o_orderpriority, l.top_price, l.top_line
      |FROM orders o, LATERAL (
      |  SELECT l_extendedprice AS top_price, l_linenumber AS top_line
      |  FROM lineitem
      |  WHERE l_orderkey = o.o_orderkey
      |  ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 1) l
      |WHERE o.o_totalprice > 450000.0""".stripMargin

  /** TPC-H-Q21-shaped (added r9 — the optimizer-stress trio): suppliers
    * who were the SOLE returning supplier on a finished multi-supplier
    * order. The reference Q21's "kept waiting" predicate
    * (receiptdate > commitdate) maps to the fixture's returned-line
    * flag; the plan stress is identical and is the point: one EXISTS
    * and one NOT EXISTS, both correlated SELF-joins of the fact with a
    * non-equi residual (l2.l_suppkey <> l1.l_suppkey), must decorrelate
    * to a left-semi and a left-anti hash join on l_orderkey — a naive
    * planner re-scans lineitem per row or degenerates to a product
    * (PlanSpec pins semi+anti, no cartesian). */
  private val q21 =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |  AND s_nationkey = n_nationkey
      |  AND n_name IN ('NATION_1', 'NATION_3', 'NATION_5', 'NATION_7')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  /** TPC-H-Q16-shaped: distinct-supplier counts per part group,
    * excluding flagged suppliers via NOT IN — the null-aware anti join
    * (Spark's NullAwareAntiJoin path) plus a COUNT(DISTINCT) over the
    * join result; lineitem stands in for partsupp (same key shape), the
    * negative-balance rule for the complaints LIKE. */
  private val q16 =
    """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#15'
      |  AND p_type NOT LIKE 'MEDIUM%'
      |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 200""".stripMargin

  /** TPC-H-Q2-shaped: per part, the cheapest EUROPE-region offer —
    * unit cost = l_extendedprice / l_quantity (one IEEE division, bit-
    * identical cross-engine), the correlated MIN subquery re-filters by
    * the SAME region inside the correlation. Catalyst must decorrelate
    * to one grouped min + equi join back on the part key, never a
    * per-part rescan of the fact (the classic Q2 planner trap). */
  private val q2 =
    """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |  l_extendedprice / l_quantity AS unit_cost
      |FROM part, supplier, lineitem, nation, region
      |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |  AND p_size = 25
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND l_extendedprice / l_quantity = (
      |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      |    FROM lineitem l2, supplier s2, nation n2, region r2
      |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  private def run(sql: String): (SparkSession, String) => DataFrame = { (s, dir) =>
    registerViews(s, dir)
    ordered(s.sql(sql))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sql_tpch_q1" -> run(q1),
    "q_sql_tpch_q10" -> run(q10),
    "q_sql_tpch_q3" -> run(q3),
    "q_sql_tpch_q5" -> run(q5),
    "q_sql_tpch_q18" -> run(q18),
    "q_sql_tpch_q21" -> run(q21),
    "q_sql_tpch_q16" -> run(q16),
    "q_sql_tpch_q2" -> run(q2),
    "q_sql_exists_subquery" -> run(existsBig),
    "q_sql_scalar_subquery" -> run(scalarSub),
    "q_sql_cte_window" -> run(cteWindow),
    "q_sql_recursive_cte" -> run(recursiveSpine),
    "q_sql_lateral" -> run(lateralTop)
  )

  def oracle: Map[String, String] = Map(
    "q_sql_tpch_q1" ->
      (q1 + orderByAll("l_returnflag", "l_linestatus", "sum_qty",
        "sum_base_price", "sum_disc_price", "sum_charge", "avg_qty",
        "avg_price", "avg_disc", "count_order")),
    "q_sql_tpch_q10" ->
      (s"SELECT * FROM ($q10)" +
        orderByAll("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")),
    "q_sql_tpch_q3" ->
      (s"SELECT * FROM ($q3)" +
        orderByAll("l_orderkey", "o_orderdate", "o_orderpriority", "revenue")),
    "q_sql_tpch_q5" ->
      (q5 + orderByAll("n_name", "revenue")),
    "q_sql_tpch_q18" ->
      (q18 + orderByAll("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")),
    "q_sql_tpch_q21" ->
      (s"SELECT * FROM ($q21)" + orderByAll("s_name", "numwait")),
    "q_sql_tpch_q16" ->
      (s"SELECT * FROM ($q16)" +
        orderByAll("p_brand", "p_type", "p_size", "supplier_cnt")),
    "q_sql_tpch_q2" ->
      (s"SELECT * FROM ($q2)" +
        orderByAll("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
          "unit_cost")),
    "q_sql_exists_subquery" ->
      (existsBig + orderByAll("c_custkey", "c_name", "c_acctbal")),
    "q_sql_scalar_subquery" ->
      (scalarSub + orderByAll("s_suppkey", "s_name", "s_nationkey", "s_acctbal")),
    "q_sql_cte_window" ->
      (s"SELECT * FROM ($cteWindow)" +
        orderByAll("o_custkey", "mon", "m_total", "running_total", "rn")),
    "q_sql_recursive_cte" ->
      (recursiveSpine + orderByAll("day", "n_events", "n_users")),
    "q_sql_lateral" ->
      (lateralTop + orderByAll("o_orderkey", "o_orderpriority", "top_price", "top_line"))
  )
}
