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

  /** TPC-H-Q7-shaped (added r9): bidirectional two-nation trade volume
    * by ship year. The OR of the two (supp, cust) nation pairs is a
    * join-level disjunction Catalyst must keep as a residual on the
    * n1×n2 pair while still planning both nation joins as broadcasts;
    * the year extraction must not block partition-era pruning of the
    * date range. EXTRACT(YEAR) is cast BIGINT on both engines (DuckDB
    * yields BIGINT, Spark INT — schema match requires the cast). */
  private val q7 =
    """SELECT supp_nation, cust_nation, l_year,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice, l_discount
      |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |    AND c_nationkey = n2.n_nationkey
      |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00') shipping
      |GROUP BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H-Q11-shaped: per-part value concentration for one nation's
    * suppliers, kept above a fraction of that nation's TOTAL value —
    * the same 3-way join feeds both the grouped agg and the
    * uncorrelated scalar subquery; Catalyst plans the scalar once
    * (subquery, not a rescan per group) and broadcasts it into the
    * HAVING filter. Both sums decimal-exact; ONE double multiply for
    * the threshold. */
  private val q11 =
    """SELECT l_partkey, value_sum
      |FROM (
      |  SELECT l_partkey,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS value_sum
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
      |  GROUP BY l_partkey) t
      |WHERE value_sum > (
      |  SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) * CAST(0.001 AS DOUBLE)
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_2')""".stripMargin

  /** TPC-H-Q13-shaped: customer order-count distribution. The stress is
    * the OUTER join with a predicate on the INNER side only (must stay
    * in the join condition, NOT be pushed as a filter — pushing it
    * below the left join would drop zero-order customers) followed by a
    * double aggregation (count per customer, then histogram of counts).
    * All-integer output — bit-exact anywhere. */
  private val q13 =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  /** TPC-H-Q14-shaped: promo revenue share for one ship month — the
    * conditional-aggregate pattern (CASE inside SUM), two decimal-exact
    * sums over ONE scan (no self-join), one IEEE divide + multiply.
    * Left-assoc `100 * a / b` parses identically on both engines. */
  private val q14 =
    """SELECT CAST(100 AS DOUBLE) *
      |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
      |    THEN CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS STRING) AS DOUBLE) /
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'""".stripMargin

  /** TPC-H-Q17-shaped: revenue from small-quantity lines of one brand,
    * where "small" is relative to the PER-PART average quantity — the
    * correlated scalar AVG subquery must decorrelate to one grouped agg
    * over lineitem + an equi join back on l_partkey (the classic Q17
    * planner trap: a naive plan rescans lineitem per outer row). The
    * threshold is decimal-exact sum / count → two IEEE ops; comparing
    * stored doubles against it is engine-identical. */
  private val q17 =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / CAST(7 AS DOUBLE) AS avg_yearly
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND p_brand = 'Brand#12'
      |  AND l_quantity < (
      |    SELECT CAST(0.2 AS DOUBLE) * (CAST(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H-Q19-shaped: disjunctive predicate groups spanning BOTH join
    * sides — the planner must extract the common `p_partkey = l_partkey`
    * equi-condition and the per-side implied filters (p_brand IN …,
    * l_quantity BETWEEN global bounds) from under the OR so the scans
    * prune, leaving the cross-side disjunction as a post-join residual
    * — not degenerate to a cartesian with one giant OR filter. */
  private val q19 =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey AND (
      |  (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5 AND l_quantity >= 1 AND l_quantity <= 11)
      |  OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity >= 10 AND l_quantity <= 20)
      |  OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  /** TPC-H-Q20-shaped: suppliers who moved serious volume of a part
    * family — a DOUBLY NESTED semi-join chain (suppkey IN grouped-
    * HAVING subquery whose input is itself filtered by partkey IN
    * part-name subquery). Both IN's must become left-semi hash joins,
    * with the grouped HAVING aggregated BEFORE the semi (the aggregate,
    * not raw lineitem, crosses the shuffle). Exact decimal HAVING. */
  private val q20 =
    """SELECT s_name, s_acctbal
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      |    GROUP BY l_suppkey, l_partkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 25)
      |  AND s_nationkey = n_nationkey AND n_name IN ('NATION_2', 'NATION_4')""".stripMargin

  /** TPC-H-Q22-shaped churn roll-up: well-funded customers in a nation
    * cohort with NO recent orders — an uncorrelated scalar AVG (over
    * the positive-balance cohort) feeding a filter, plus a correlated
    * NOT EXISTS that must plan as a left-ANTI hash join on o_custkey
    * with the date bound pushed into the orders scan (the anti side
    * shrinks by ~10× before the join at any scale). */
  private val q22 =
    """SELECT cntrycode, COUNT(*) AS numcust,
      |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS totacctbal
      |FROM (
      |  SELECT c_nationkey AS cntrycode, c_acctbal
      |  FROM customer c
      |  WHERE c_nationkey IN (1, 3, 5, 7, 9)
      |    AND c_acctbal > (
      |      SELECT CAST(CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) / COUNT(*)
      |      FROM customer c2 WHERE c2.c_acctbal > CAST(0 AS DOUBLE)
      |        AND c2.c_nationkey IN (1, 3, 5, 7, 9))
      |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')) custsale
      |GROUP BY cntrycode""".stripMargin

  /** TPC-H-Q4-shaped (added r9, completing the 22-query suite): order
    * priority counts for one quarter where some line shipped late —
    * correlated EXISTS against the fact with a non-equi residual
    * (l_shipdate > o_orderdate pulls a column from EACH side into the
    * semi-join condition); late-ship stands in for the absent
    * commit/receipt dates. All-integer output. */
  private val q4 =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin

  /** TPC-H-Q6-shaped: the pure scan-predicate aggregate — no join at
    * all; date + two range predicates must ALL reach the parquet scan
    * (this is the canonical pushdown benchmark query). Range literals
    * cast to DOUBLE explicitly so both engines compare the same bits. */
  private val q6 =
    """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= CAST(0.03 AS DOUBLE) AND l_discount <= CAST(0.05 AS DOUBLE)
      |  AND l_quantity < CAST(24 AS DOUBLE)""".stripMargin

  /** TPC-H-Q8-shaped market share: the 8-table star (both nation roles
    * — customer region filter vs supplier nationality) with a
    * conditional share ratio per year. The CASE keeps DECIMAL type
    * through the sum (explicit ELSE 0 decimal), so both engine sums
    * are exact and the share is one IEEE division. */
  private val q8 =
    """SELECT o_year,
      |  CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume_q ELSE CAST(0 AS DECIMAL(18,4)) END) AS STRING) AS DOUBLE) /
      |  CAST(CAST(SUM(volume_q) AS STRING) AS DOUBLE) AS mkt_share
      |FROM (
      |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS volume_q,
      |    n2.n_name AS nation
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
      |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
      |    AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
      |    AND s_nationkey = n2.n_nationkey
      |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |    AND p_type = 'PROMO') all_nations
      |GROUP BY o_year""".stripMargin

  /** TPC-H-Q9-shaped profit by nation and year — the LIKE-filtered
    * 5-table join with a two-term decimal expression inside the sum
    * (revenue − cost, cost = retailprice·quantity standing in for the
    * absent supplycost); the %infix% LIKE cannot prune the scan (a
    * known Q9 trait), so the plan lives on join order + broadcast
    * dims. */
  private val q9 =
    """SELECT nation, o_year, sum_profit FROM (
      |  SELECT n_name AS nation, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
      |      - CAST(p_retailprice AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_profit
      |  FROM part, supplier, lineitem, orders, nation
      |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey AND l_orderkey = o_orderkey
      |    AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
      |  GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)) profit""".stripMargin

  /** TPC-H-Q12-shaped late-shipment priority split: conditional
    * IN/NOT-IN counts per return flag (stand-in for the absent
    * shipmode) with a cross-table residual (l_shipdate > o_orderdate)
    * on the join. All-integer output. */
  private val q12 =
    """SELECT l_returnflag,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > o_orderdate
      |GROUP BY l_returnflag""".stripMargin

  /** TPC-H-Q15-shaped top supplier: the same CTE referenced TWICE —
    * once as the join input and once under a scalar MAX — Catalyst
    * must either reuse the aggregated subplan (exchange/subquery
    * reuse) or at worst aggregate lineitem twice, never rescan per
    * row; revenue equality compares identically-derived doubles. */
  private val q15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS STRING) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)""".stripMargin

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
    "q_sql_tpch_q7" -> run(q7),
    "q_sql_tpch_q11" -> run(q11),
    "q_sql_tpch_q13" -> run(q13),
    "q_sql_tpch_q14" -> run(q14),
    "q_sql_tpch_q17" -> run(q17),
    "q_sql_tpch_q19" -> run(q19),
    "q_sql_tpch_q20" -> run(q20),
    "q_sql_tpch_q22" -> run(q22),
    "q_sql_tpch_q4" -> run(q4),
    "q_sql_tpch_q6" -> run(q6),
    "q_sql_tpch_q8" -> run(q8),
    "q_sql_tpch_q9" -> run(q9),
    "q_sql_tpch_q12" -> run(q12),
    "q_sql_tpch_q15" -> run(q15),
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
    "q_sql_tpch_q7" ->
      (q7 + orderByAll("supp_nation", "cust_nation", "l_year", "revenue")),
    "q_sql_tpch_q11" ->
      (q11 + orderByAll("l_partkey", "value_sum")),
    "q_sql_tpch_q13" ->
      (q13 + orderByAll("c_count", "custdist")),
    "q_sql_tpch_q14" ->
      (q14 + orderByAll("promo_revenue")),
    "q_sql_tpch_q17" ->
      (q17 + orderByAll("avg_yearly")),
    "q_sql_tpch_q19" ->
      (q19 + orderByAll("revenue")),
    "q_sql_tpch_q20" ->
      (q20 + orderByAll("s_name", "s_acctbal")),
    "q_sql_tpch_q22" ->
      (q22 + orderByAll("cntrycode", "numcust", "totacctbal")),
    "q_sql_tpch_q4" ->
      (q4 + orderByAll("o_orderpriority", "order_count")),
    "q_sql_tpch_q6" ->
      (q6 + orderByAll("revenue")),
    "q_sql_tpch_q8" ->
      (q8 + orderByAll("o_year", "mkt_share")),
    "q_sql_tpch_q9" ->
      (q9 + orderByAll("nation", "o_year", "sum_profit")),
    "q_sql_tpch_q12" ->
      (q12 + orderByAll("l_returnflag", "high_line_count", "low_line_count")),
    "q_sql_tpch_q15" ->
      (q15 + orderByAll("s_suppkey", "s_name", "total_revenue")),
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
