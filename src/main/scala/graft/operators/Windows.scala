package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Det._
import graft.sources.Tables

/** B5 — window functions (SURVEY.md §2).
  *
  * Determinism: every window ORDER BY carries a unique-key tiebreak,
  * and frame aggregates over DOUBLE go through DECIMAL(18,4) — DuckDB
  * evaluates frames with a segment tree, so double addition order
  * differs from Spark's running accumulator; decimal is order-proof.
  *
  * Scale: one shuffle per distinct partitionBy key set; top-k-per-
  * group plans as WindowGroupLimit (rank pushdown) so only k rows per
  * group survive the exchange. */
object Windows {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_rank" -> { (s, dir) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc_nulls_last, col("c_custkey").asc_nulls_first)
      ordered(Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn")))
    },
    "q_win_dist" -> { (s, dir) =>
      // Distribution ranks: percent_rank = (rank-1)/(n-1) and
      // cume_dist = n_peers_le/n are integer-ratio doubles — IEEE
      // division of identical integers, so cross-engine exact even
      // with ties.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").asc_nulls_first, col("c_custkey").asc_nulls_first)
      ordered(Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        percent_rank().over(w).as("pct_rnk"),
        cume_dist().over(w).as("cdist")))
    },
    "q_win_topk_group" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey").asc_nulls_first)
      ordered(Tables(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn")))
    },
    "q_win_running" -> { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc_nulls_first, col("o_orderkey").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ordered(Tables(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("running_total")))
    },
    "q_win_sliding" -> { (s, dir) =>
      // daily revenue, then a 7-row moving average over days
      val daily = Tables(s, dir, "lineitem")
        .groupBy(date_trunc("DAY", col("l_shipdate")).as("day"))
        .agg(sum(money(col("l_extendedprice"))).as("rev_dec"))
      val w = Window.orderBy(col("day").asc_nulls_first).rowsBetween(-6, 0)
      ordered(daily.select(
        col("day"),
        col("rev_dec").cast("double").as("day_rev"),
        (sum(col("rev_dec")).over(w).cast("double") /
          count(lit(1)).over(w)).as("ma7")))
    },
    "q_win_median" -> { (s, dir) =>
      // Rolling MEDIAN (added r9) — the order-statistic window the
      // running-sum family (q_win_sliding's MA, q_win_running) cannot
      // express: a 7-row trailing median of the daily series per event
      // type, the robust smoother dashboards use where a mean is
      // outlier-dragged. Exact percentile(0.5) over a rows frame —
      // Spark evaluates the frame buffer per row (no partial-agg
      // shortcut exists for order statistics; cost is frame-bounded,
      // 7 values here). Determinism: the daily inputs are exact
      // quantized BIGINTs (floor of the decimal day sum), and the
      // even-count interpolation (a+b)/2 is the same IEEE expression
      // in both engines on integers < 2^53.
      // 100 TB posture: one corpus shuffle into the daily pre-agg;
      // the window runs over |types|·|days| rows with a 7-deep buffer.
      val daily = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          expr("CAST(ts AS LONG) DIV 86400").as("day"))
        .agg(floor(sum(money(col("value")))).cast("long").as("y"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("day").asc_nulls_first).rowsBetween(-6, 0)
      ordered(daily.select(col("event_type"), col("day"), col("y"),
        expr("percentile(y, 0.5)").over(w).as("med7")))
    },
    "q_win_range_frame" -> { (s, dir) =>
      // RANGE frame over orderdate epoch-seconds: per customer, total
      // of orders in the trailing 90 days (inclusive).
      val sec = 90L * 24 * 3600
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_s").asc_nulls_first)
        .rangeBetween(-sec, 0)
      ordered(Tables(s, dir, "orders")
        .withColumn("epoch_s", unix_timestamp(col("o_orderdate")))
        .select(
          col("o_custkey"), col("o_orderkey"), col("epoch_s"),
          sum(money(col("o_totalprice"))).over(w).cast("double").as("tot_90d"),
          count(lit(1)).over(w).as("n_90d")))
    },
    "q_win_lead_lag" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      ordered(Tables(s, dir, "events").select(
        col("user_id"), col("event_id"), col("ts"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
          .as("gap_s"),
        lead(col("event_type"), 1).over(w).as("next_type")))
    },
    "q_win_ntile" -> { (s, dir) =>
      val w = Window.orderBy(col("o_totalprice").asc_nulls_first, col("o_orderkey").asc_nulls_first)
      ordered(Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).as("quartile")))
    },
    "q_win_first_last" -> { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      ordered(Tables(s, dir, "events").select(
          col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type")))
    },
    "q_win_streak" -> { (s, dir) =>
      // Gaps-and-islands — the classic consecutive-run windowing shape
      // none of the other window keys exercise: per user, maximal runs
      // of consecutive same-type events (islands), then per
      // (user, type) the LONGEST streak with its span. Islands via the
      // single-sort formulation (type-change flag from lag + running
      // sum — q_sessionize's boundary trick, NOT the two-row_number
      // difference, which would need a second events-sized
      // shuffle-sort on (user, type)). Integer arithmetic end to end.
      // 100 TB posture: ONE events-sized shuffle-sort on user_id
      // carries both window passes (lag + running sum share the
      // frame); everything after is island-sized — a hash agg with
      // map-side partials and a best-pick window over islands.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      val isl = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("flag", when(lag(col("event_type"), 1).over(w).isNull ||
          col("event_type") =!= lag(col("event_type"), 1).over(w), 1L).otherwise(0L))
        .withColumn("grp", sum(col("flag"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val streaks = isl.groupBy(col("user_id"), col("grp"))
        .agg(min(col("event_type")).as("event_type"), count(lit(1)).as("len"),
          min(col("event_id")).as("first_id"), max(col("event_id")).as("last_id"))
      val wBest = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("len").desc, col("first_id").asc)
      ordered(streaks.withColumn("rn", row_number().over(wBest))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("len").as("longest_streak"),
          col("first_id"), col("last_id")))
    },
    "q_win_session_window" -> { (s, dir) =>
      // The BUILT-IN session_window — the declarative twin of
      // q_sessionize's lag/flag/running-sum formulation (and of the
      // streaming StatefulSession): Spark merges per-key event-time
      // windows that overlap under the 30-min gap; one shuffle on the
      // grouping key, no window-function pass at all. Boundary
      // semantics the oracle mirrors at µs precision: a window is
      // [start, last+gap), so a gap of EXACTLY 30 min starts a new
      // session, and session_end = last event + gap (q_sessionize
      // reports last-event ts instead).
      ordered(Tables(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("session_start"),
          col("session_window.end").cast("long").as("session_end"),
          col("n_events"), col("sum_value")))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_win_streak" ->
      ("""WITH fl AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR event_type <> lag(event_type) OVER w THEN 1 ELSE 0 END AS flag
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (
        |  SELECT user_id, event_id, event_type,
        |    SUM(flag) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM fl),
        |st AS (
        |  SELECT user_id, MIN(event_type) AS event_type, grp, COUNT(*) AS len,
        |    MIN(event_id) AS first_id, MAX(event_id) AS last_id
        |  FROM isl GROUP BY user_id, grp),
        |best AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY len DESC, first_id ASC) AS rn
        |  FROM st)
        |SELECT user_id, event_type, CAST(len AS BIGINT) AS longest_streak,
        |  first_id, last_id
        |FROM best WHERE rn = 1""".stripMargin +
        orderByAll("user_id", "event_type", "longest_streak",
          "first_id", "last_id")),
    "q_win_session_window" ->
      ("""WITH flagged AS (
        |  SELECT user_id, ts, value, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM flagged)
        |SELECT user_id, MIN(us)//1000000 AS session_start,
        |  (MAX(us) + 1800000000)//1000000 AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin +
        orderByAll("user_id", "session_start", "session_end",
          "n_events", "sum_value")),
    "q_win_rank" ->
      ("""SELECT c_custkey, c_nationkey, c_acctbal,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |  row_number() OVER w AS rn
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC NULLS LAST, c_custkey ASC NULLS FIRST)""".stripMargin +
        orderByAll("c_custkey", "c_nationkey", "c_acctbal", "rnk", "drnk", "rn")),
    "q_win_median" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400 AS day,
        |    CAST(floor(SUM(CAST(value AS DECIMAL(18,4)))) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, epoch_us(ts)//1000000//86400)
        |SELECT event_type, day, y,
        |  quantile_cont(y, 0.5) OVER (PARTITION BY event_type
        |    ORDER BY day ASC ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM daily""".stripMargin +
        orderByAll("event_type", "day", "y", "med7")),
    "q_win_dist" ->
      ("""SELECT c_custkey, c_mktsegment, c_acctbal,
        |  percent_rank() OVER w AS pct_rnk, cume_dist() OVER w AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal ASC NULLS FIRST, c_custkey ASC NULLS FIRST)""".stripMargin +
        orderByAll("c_custkey", "c_mktsegment", "c_acctbal", "pct_rnk", "cdist")),
    "q_win_topk_group" ->
      ("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC NULLS FIRST) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin +
        orderByAll("o_custkey", "o_orderkey", "o_totalprice", "rn")),
    "q_win_running" ->
      ("""SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC NULLS FIRST, o_orderkey ASC NULLS FIRST
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
        |    AS running_total
        |FROM orders""".stripMargin +
        orderByAll("o_custkey", "o_orderkey", "o_orderdate", "running_total")),
    "q_win_sliding" ->
      ("""WITH daily AS (
        |  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS rev_dec
        |  FROM lineitem GROUP BY 1)
        |SELECT day, CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS day_rev,
        |  CAST(CAST(SUM(rev_dec) OVER w AS VARCHAR) AS DOUBLE) / COUNT(*) OVER w AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ASC NULLS FIRST ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin +
        orderByAll("day", "day_rev", "ma7")),
    "q_win_range_frame" ->
      ("""SELECT o_custkey, o_orderkey, epoch_s,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS VARCHAR) AS DOUBLE) AS tot_90d,
        |  COUNT(*) OVER w AS n_90d
        |FROM (SELECT *, CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_s ASC NULLS FIRST
        |  RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW)""".stripMargin +
        orderByAll("o_custkey", "o_orderkey", "epoch_s", "tot_90d", "n_90d")),
    "q_win_lead_lag" ->
      ("""SELECT user_id, event_id, ts,
        |  CAST(epoch(date_trunc('second', ts)) AS BIGINT)
        |    - CAST(epoch(date_trunc('second', lag(ts, 1) OVER w)) AS BIGINT) AS gap_s,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST)""".stripMargin +
        orderByAll("user_id", "event_id", "ts", "gap_s", "next_type")),
    "q_win_ntile" ->
      ("""SELECT o_orderkey, o_totalprice, ntile(4) OVER (
        |  ORDER BY o_totalprice ASC NULLS FIRST, o_orderkey ASC NULLS FIRST) AS quartile
        |FROM orders""".stripMargin +
        orderByAll("o_orderkey", "o_totalprice", "quartile")),
    "q_win_first_last" ->
      ("""SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin +
        orderByAll("user_id", "event_id", "first_type", "last_type"))
  )
}
