package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B9 (batch half) — event-time windowing and sessionization over the
  * `events` table (SURVEY.md §2 B9). These are the batch twins of the
  * streaming `s_*` operators in [[Streaming]]; the stream-vs-batch
  * equivalence tests (§5.2.4) compare against these keys.
  *
  * Determinism: window starts are emitted as BIGINT epoch-seconds
  * (cast of the aligned `window(ts, …).start`), so no cross-engine
  * timestamp conversion is involved; all sums are exact DECIMAL(18,4).
  *
  * 100 TB posture: `groupBy(window(...))` is a plain hash aggregate on
  * a derived bucket column — partial aggregation map-side, one shuffle
  * on (bucket), no window-function sort. Sessionization is the one
  * genuinely sort-heavy op (shuffle on user_id + per-user sort); at
  * scale that is the intended layout (sessions are per-user local), and
  * the same plan incrementalizes as `session_window` in streaming.
  */
object Time {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_tumbling" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      ordered(e.groupBy(window(col("ts"), "1 hour").getField("start")
          .cast("long").as("bucket_start"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          countDistinct(col("user_id")).as("n_users")))
    },
    "q_time_sliding" -> { (s, dir) =>
      // 1-hour window sliding 15 min: each event lands in exactly 4
      // buckets (slide divides width). Spark expands via window();
      // the oracle expands arithmetically (§7.4).
      val e = Tables(s, dir, "events")
      ordered(e.groupBy(window(col("ts"), "1 hour", "15 minutes")
          .getField("start").cast("long").as("bucket_start"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value")))
    },
    "q_time_gap_fill" -> { (s, dir) =>
      // Time-series densification: per-user hourly resample with the
      // gaps filled in (the step before any training on regular time
      // grids / windowed features — missing hours must exist as zero
      // rows). Each user's spine is generated from its own [min, max]
      // hour with `sequence` + explode — bounded fan-out (≤ span
      // hours), no global cross join of users × all hours. One shuffle
      // for the per-(user, hour) agg, one equi join of spine↔agg on
      // the same key (co-partitioned). At 100 TB the spine side is
      // tiny (users × hours) relative to events and the join keys are
      // already hashed — gap filling never touches the raw event rows
      // a second time.
      val e = Tables(s, dir, "events").filter(col("user_id") < 50L)
        .select(col("user_id"),
          (expr("CAST(ts AS LONG) DIV 3600") * 3600).as("bucket"),
          col("value"))
      val agg = e.groupBy(col("user_id"), col("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sv"))
      val spine = e.groupBy(col("user_id"))
        .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        .select(col("user_id"),
          explode(expr("sequence(mn, mx, 3600)")).as("bucket"))
      ordered(spine.join(agg, Seq("user_id", "bucket"), "left")
        .select(col("user_id"), col("bucket"),
          coalesce(col("n"), lit(0L)).cast("long").as("n_events"),
          coalesce(col("sv"), lit(0.0)).as("sum_value")))
    },
    "q_time_interp" -> { (s, dir) =>
      // Linear interpolation over the densified series — gap_fill's
      // zero-fill twin for metrics where a missing hour means "not
      // observed", not "zero" (sensor feeds, sampled telemetry).
      // Interior gaps get prev + (next − prev)·frac from the nearest
      // observed neighbors via IGNORE-NULLS window scans — two window
      // passes over the spine (users × hours, tiny next to events),
      // never a self-join. Spine endpoints are observed by
      // construction (per-type [min, max]), so every gap is interior
      // and the interpolation is total. The arithmetic is the same
      // IEEE op sequence in the oracle over exact decimal-sum inputs,
      // so doubles hash-match bit-for-bit.
      val hourly = Tables(s, dir, "events")
        .groupBy(col("event_type"),
          (expr("CAST(ts AS LONG) DIV 3600") * 3600).as("bucket"))
        .agg(dsum(col("value")).as("x"))
      val spine = hourly.groupBy(col("event_type"))
        .agg(min(col("bucket")).as("mn"), max(col("bucket")).as("mx"))
        .select(col("event_type"),
          explode(expr("sequence(mn, mx, 3600)")).as("bucket"))
      val joined = spine.join(hourly, Seq("event_type", "bucket"), "left")
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wNext = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val obsBucket = when(col("x").isNotNull, col("bucket"))
      val marked = joined
        .withColumn("pv", last(col("x"), ignoreNulls = true).over(wPrev))
        .withColumn("pb", last(obsBucket, ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("x"), ignoreNulls = true).over(wNext))
        .withColumn("nb", first(obsBucket, ignoreNulls = true).over(wNext))
      ordered(marked.select(col("event_type"), col("bucket"),
        col("x").isNull.as("interpolated"),
        when(col("x").isNotNull, col("x"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("bucket") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double"))).as("y")))
    },
    "q_time_funnel" -> { (s, dir) =>
      // Ordered funnel (view → click → purchase): each stage counts
      // users whose FIRST qualifying event is strictly after the
      // previous stage's first event — the standard product-analytics
      // conversion funnel. Three conditional-min hash aggs chained by
      // equi joins on user_id (co-partitioned: one shuffle establishes
      // the (user) partitioning, the later joins and aggs reuse it);
      // no window sort, no per-user event collection. At 100 TB this
      // scales as 3 passes over (user, type, ts) triples with partial
      // aggs — the alternative single-pass sorted-window formulation
      // shuffles the same volume but adds a per-user sort.
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("long").as("sec"))
      val v = e.groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("sec"))).as("t_view"))
      val c = v.join(e, "user_id")
        .groupBy(col("user_id"), col("t_view"))
        .agg(min(when(col("event_type") === "click" && col("sec") > col("t_view"),
          col("sec"))).as("t_click"))
      val p = c.join(e, "user_id")
        .groupBy(col("user_id"), col("t_view"), col("t_click"))
        .agg(min(when(col("event_type") === "purchase" && col("sec") > col("t_click"),
          col("sec"))).as("t_purch"))
      val counts = p.agg(count(col("t_view")).as("nv"),
        count(col("t_click")).as("nc"), count(col("t_purch")).as("np"))
      ordered(counts.selectExpr(
        "stack(3, 1, 'view', nv, 2, 'click', nc, 3, 'purchase', np) AS (stage, step, n_users)"))
    },
    "q_agg_retention" -> { (s, dir) =>
      // Cohort retention triangle: cohort = a user's first active
      // epoch-week, cell (cohort, offset) = distinct users from that
      // cohort active offset weeks later — the growth-accounting
      // staple. Two hash aggs + one equi join on user_id; the
      // (user, week) de-dup collapses the event volume FIRST, so the
      // cohort join moves O(users × active-weeks), not O(events).
      // All-integer week arithmetic (epoch DIV 604800), exact on both
      // engines.
      val e = Tables(s, dir, "events")
        .select(col("user_id"), expr("CAST(ts AS LONG) DIV 604800").as("wk"))
        .distinct()
      val first = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ordered(e.join(first, "user_id")
        .groupBy(col("cohort"), (col("wk") - col("cohort")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users")))
    },
    "q_time_ohlc" -> { (s, dir) =>
      // OHLC downsampling — the time-series resample behind candle
      // charts and metric rollups: per 1-hour bucket, the first
      // (open) and last (close) value in event order plus min/max and
      // exact volume. Open/close use min_by/max_by over the unique
      // (ts, event_id) struct — deterministic ties, and the whole key
      // stays ONE hash aggregate with map-side partials (no window
      // sort: at 100 TB first/last-by-order as an agg beats a
      // partition sort by a full shuffle-sort pass).
      val e = Tables(s, dir, "events")
        .withColumn("bucket",
          expr("CAST(ts AS LONG) DIV 3600 * 3600"))
      ordered(e.groupBy(col("bucket"))
        .agg(min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          min(col("value")).as("low"), max(col("value")).as("high"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("volume")))
    },
    "q_event_transitions" -> { (s, dir) =>
      // Event-sequence transition matrix (first-order Markov counts):
      // per user in (ts, event_id) order, count each consecutive
      // (prev_type → event_type) step + distinct users making it —
      // the path-analysis primitive behind funnels and next-action
      // models. One per-user window sort (sessions' layout: shuffle
      // on user_id, sort within — at 100 TB the same per-user-local
      // plan), then a vocabulary-sized hash agg (|types|² groups).
      val e = Tables(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ordered(e.withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type"))
        .agg(count(lit(1)).as("n_transitions"),
          countDistinct(col("user_id")).as("n_users")))
    },
    "q_event_attribution" -> { (s, dir) =>
      // Last-touch attribution — the conversion-credit rule every
      // growth pipeline runs (beside funnel/transitions/retention):
      // each purchase attributes to the user's most recent prior
      // click/view within a 3-day lookback; purchases with no
      // in-window touch report as unattributed. ONE per-user window
      // sort: a conditional struct carried by last(ignoreNulls) over
      // the preceding frame holds the latest touch; the lookback is a
      // residual integer-second check. Per (touch_type, attributed)
      // report with exact decimal revenue.
      // 100 TB posture: identical layout to q_event_transitions — one
      // shuffle on user_id, per-user-local sort; no self-join of the
      // event table against itself (the naive purchase×touch join is
      // quadratic in a user's activity).
      val e = Tables(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val touch = when(col("event_type").isin("click", "view"),
        struct(expr("CAST(ts AS LONG)").as("tsec"), col("event_type").as("ttype"),
          col("event_id").as("tid")))
      val marked = e
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .withColumn("gap", expr("CAST(ts AS LONG)") - col("lt.tsec"))
        // a purchase row's own struct is null (not click/view), so lt
        // at the purchase row is genuinely the latest PRIOR touch
        .withColumn("attributed",
          col("lt").isNotNull && col("gap") <= lit(259200L))
      ordered(marked.groupBy(
          when(col("attributed"), col("lt.ttype")).otherwise("none").as("touch_type"),
          col("attributed"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("revenue")))
    },
    "q_time_ewma" -> { (s, dir) =>
      // Exponentially-weighted moving average (α = 1/2) over the
      // per-type daily mean series, truncated at 8 taps. Cross-engine
      // bit-determinism by construction: the taps are explicit lag()
      // columns combined left-associatively, every weight 2^-j is an
      // exact power of two (each product is a double SCALE, not a
      // rounding), and the normalizer 1.9921875 is exactly
      // representable — so both engines run the identical IEEE op
      // sequence on identical inputs. 100 TB: the heavy shuffle is
      // the daily pre-agg of raw events (map-side partials); the lag
      // window then runs over #types × #days rows — negligible.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          (expr("CAST(ts AS LONG) DIV 86400") * 86400).as("bucket"))
        .agg(davg(col("value")).as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
      val lagged = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("ewma",
          (col("x")
            + lag(col("x"), 1).over(w) * 0.5
            + lag(col("x"), 2).over(w) * 0.25
            + lag(col("x"), 3).over(w) * 0.125
            + lag(col("x"), 4).over(w) * 0.0625
            + lag(col("x"), 5).over(w) * 0.03125
            + lag(col("x"), 6).over(w) * 0.015625
            + lag(col("x"), 7).over(w) * 0.0078125) / 1.9921875)
      ordered(lagged.filter(col("rn") >= 8)
        .select(col("event_type"), col("bucket"), col("x"), col("ewma")))
    },
    "q_time_trend" -> { (s, dir) =>
      // Per-type OLS trend line over the daily series — the "is this
      // metric drifting, and how fast" summary beside q_time_autocorr
      // (persistence) and q_time_cusum (changepoints): slope and
      // intercept of daily_total ~ day_index from the classic
      // closed-form moments. Day index is re-based per type (day −
      // min(day)) so the t-moments stay small; all moments sum as
      // exact DECIMAL(38,0) (r9 — BIGINT squared moments had limited
      // headroom: sy² nears 1e17 at fixture scale and a ×10 soak
      // multiplies squared terms ×100, where Spark int64 wraps
      // silently while DuckDB promotes to HUGEINT; 38-digit decimals
      // match HUGEINT exactness to ~1e38), and slope/intercept/r² are
      // single shared IEEE expressions on identical integers (each
      // decimal→double cast is correctly rounded in Spark; the oracle
      // takes the VARCHAR hop per the house Det rule). Zero-variance/
      // degenerate series → NULLs.
      // 100 TB posture: daily pre-agg shuffles the corpus once; the
      // regression is a |types|-row agg over |types|·|days| rows.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          expr("CAST(ts AS LONG) DIV 86400").as("day"))
        .agg(floor(sum(money(col("value")))).cast("long").as("y"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val m = daily.withColumn("t", col("day") - min(col("day")).over(w))
        .withColumn("td", col("t").cast("decimal(19,0)"))
        .withColumn("yd", col("y").cast("decimal(19,0)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("td")).as("st"),
          sum(col("yd")).as("sy"), sum(col("td") * col("td")).as("stt"),
          sum(col("yd") * col("yd")).as("syy"), sum(col("td") * col("yd")).as("sty"))
      val den = m("n") * m("stt") - m("st") * m("st")
      val varY = m("n") * m("syy") - m("sy") * m("sy")
      val num = m("n") * m("sty") - m("st") * m("sy")
      ordered(m.select(col("event_type"), col("n"),
        when(den > 0L, num.cast("double") / den.cast("double")).as("slope"),
        when(den > 0L,
          (col("sy").cast("double") -
            (num.cast("double") / den.cast("double")) * col("st").cast("double")) /
            col("n").cast("double")).as("intercept"),
        when(den > 0L && varY > 0L,
          (num.cast("double") * num.cast("double")) /
            (den.cast("double") * varY.cast("double"))).as("r2")))
    },
    "q_time_cusum" -> { (s, dir) =>
      // CUSUM changepoint detection (Page 1954) — the sequential
      // level-shift detector beside q_time_anomaly's rolling z-score
      // (z flags single outliers; CUSUM accumulates SMALL persistent
      // drifts until they cross a decision threshold). The textbook
      // recursion S⁺_t = max(0, S⁺_{t-1} + (x_t−μ−k)) is not a plain
      // window aggregate, but it equals R_t − min(0, min_{j≤t} R_j)
      // for the prefix sums R of the slack-adjusted deviations — so
      // both one-sided statistics come out of ONE shuffle-sort as a
      // running sum + running min (all exact BIGINTs: quantized daily
      // totals, integer reference mean and slack k = μ/20, threshold
      // h = μ/2). 100 TB posture: daily pre-agg shuffles the corpus
      // once; the CUSUM windows run over |types|·|days| rows.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          expr("CAST(ts AS LONG) DIV 86400").as("day"))
        .agg(floor(sum(money(col("value")))).cast("long").as("x"))
      val ref = daily.groupBy(col("event_type"))
        .agg(expr("CAST(sum(x) DIV count(1) AS BIGINT)").as("mu"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val d = daily.join(broadcast(ref), Seq("event_type"))
        .withColumn("k", expr("mu DIV 20"))
        .withColumn("rp", sum(expr("x - mu - k")).over(w))
        .withColumn("rn_", sum(expr("mu - k - x")).over(w))
        .withColumn("s_pos", col("rp") - least(min(col("rp")).over(w), lit(0L)))
        .withColumn("s_neg", col("rn_") - least(min(col("rn_")).over(w), lit(0L)))
      ordered(d.select(col("event_type"), col("day"), col("x"), col("mu"),
        col("s_pos"), col("s_neg"),
        (col("s_pos") > expr("mu DIV 2") ||
          col("s_neg") > expr("mu DIV 2")).as("alarm")))
    },
    "q_time_seasonal" -> { (s, dir) =>
      // Day-of-week seasonality profile — the weekly-shape diagnostic
      // beside q_time_autocorr's lag persistence: per (type, weekday)
      // the daily-total mean and its ratio to the type's overall
      // daily mean (the "Mondays run 1.3× hotter" number a capacity
      // planner reads). Weekday from pure epoch arithmetic
      // ((days+3) % 7, Monday=0) — no engine dayofweek() numbering
      // contract; daily totals quantized exactly as in autocorr, so
      // every aggregate is an order-proof BIGINT and the two means /
      // ratio are single shared IEEE expressions.
      // 100 TB posture: the heavy shuffle is the daily pre-agg; the
      // weekday profile is |types|·7 rows, the type-level mean a tiny
      // broadcast join back.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          expr("CAST(ts AS LONG) DIV 86400").as("day"))
        .agg(floor(sum(money(col("value")))).cast("long").as("x"))
      val byDow = daily
        .withColumn("dow", expr("(day + 3) % 7"))
        .groupBy(col("event_type"), col("dow"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("tot"))
      val byType = daily.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_all"), sum(col("x")).as("tot_all"))
      ordered(byDow.join(broadcast(byType), Seq("event_type"))
        .select(col("event_type"), col("dow"), col("n_days"),
          col("tot"),
          (col("tot").cast("double") / col("n_days").cast("double")).as("dow_mean"),
          ((col("tot").cast("double") / col("n_days").cast("double")) /
            (col("tot_all").cast("double") / col("n_all").cast("double")))
            .as("ratio_vs_mean")))
    },
    "q_time_autocorr" -> { (s, dir) =>
      // Lag-k autocorrelation (k = 1..3) of the per-type daily series —
      // the seasonality/persistence diagnostic behind forecasting and
      // drift monitors (is yesterday predictive of today?). The daily
      // value is quantized ONCE to an exact integer (floor of the
      // exact DECIMAL(18,4) day sum), so every Pearson moment (n, Σx,
      // Σy, Σx², Σy², Σxy) is an exact integer no addition order can
      // perturb — summed as DECIMAL(38,0) since r9 (BIGINT wrapped
      // silently once sy² crossed int64 on soak scales while DuckDB
      // promoted to HUGEINT; 38-digit decimals match HUGEINT
      // exactness). r then comes from ONE shared IEEE expression —
      // (n·Σxy−ΣxΣy)/(√(n·Σx²−Σx²̂)·√(n·Σy²−Σy²̂)) — on identical
      // integers in both engines (correctly-rounded decimal→double in
      // Spark; VARCHAR hop in the oracle). Degenerate (zero-variance)
      // series yield NULL, not NaN.
      // 100 TB posture: the heavy shuffle is the daily pre-agg of raw
      // events (map-side decimal partials); ONE window sort per type
      // yields all three lags (stack explodes 3 rows per day), and the
      // final agg is |types|·3 rows.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          (expr("CAST(ts AS LONG) DIV 86400") * 86400).as("bucket"))
        .agg(floor(sum(money(col("value")))).cast("long").as("x"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
      val lagged = daily
        .withColumn("y1", lag(col("x"), 1).over(w))
        .withColumn("y2", lag(col("x"), 2).over(w))
        .withColumn("y3", lag(col("x"), 3).over(w))
        .selectExpr("event_type", "x",
          "stack(3, CAST(1 AS BIGINT), y1, CAST(2 AS BIGINT), y2, CAST(3 AS BIGINT), y3) AS (lag, y)")
        .filter(col("y").isNotNull)
      val m = lagged
        .withColumn("xd", col("x").cast("decimal(19,0)"))
        .withColumn("yd", col("y").cast("decimal(19,0)"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n"), sum(col("xd")).as("sx"), sum(col("yd")).as("sy"),
          sum(col("xd") * col("xd")).as("sxx"), sum(col("yd") * col("yd")).as("syy"),
          sum(col("xd") * col("yd")).as("sxy"))
      val va = col("n") * col("sxx") - col("sx") * col("sx")
      val vb = col("n") * col("syy") - col("sy") * col("sy")
      ordered(m.select(col("event_type"), col("lag"), col("n"),
        when(va > 0L && vb > 0L,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(va.cast("double")) * sqrt(vb.cast("double"))))
          .as("autocorr")))
    },
    "q_time_anomaly" -> { (s, dir) =>
      // Rolling z-score outlier flag over per-type daily totals: the
      // drift/spike monitor every ingestion pipeline runs. Trailing
      // 7-day mean/stddev derived from EXACT decimal window sums
      // (sum and sum-of-squares), then one shared IEEE double formula
      // — same q_agg_stats technique, lifted to a moving frame. The
      // raw-event shuffle is the daily pre-agg; window state is
      // 7 rows × #types.
      val e = Tables(s, dir, "events")
      val daily = e.groupBy(col("event_type"),
          (expr("CAST(ts AS LONG) DIV 86400") * 86400).as("bucket"))
        .agg(sum(money(col("value"))).as("dec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("bucket"))
      val wf = w.rowsBetween(-6, 0)
      val stats = daily
        .withColumn("rn", row_number().over(w))
        .withColumn("sx", sum(col("dec")).over(wf).cast("double"))
        // (18,4)×(18,4)→(37,8): exact and under Spark's 38-digit cap
        // (the grouped sum's (28,4) squared would overflow precision
        // and silently lose scale). Residual bound: a day's total must
        // stay below 1e14 for the (18,4) casts — ~1e9× the bench
        // fixture's daily totals; past it the cast NULLs (non-ANSI) or
        // errors (ANSI), never silently corrupts scale. Oracle twin
        // uses the same (18,4)×(18,4) — both sides exact.
        .withColumn("sxx",
          sum(col("dec").cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)) *
              col("dec").cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 4)))
            .over(wf).cast("double"))
        .withColumn("x", col("dec").cast("double"))
      val mean = col("sx") / 7.0
      // greatest(…, 0): the variance term rounds to a tiny NEGATIVE
      // double for constant windows — unclamped that is sd=NaN here
      // (and abs(NaN)>2 ⇒ is_anomaly=true) but a hard sqrt ERROR in
      // the DuckDB oracle; the clamp (mirrored in the oracle and the
      // streaming twin) makes constant windows a clean z=0
      val sd = sqrt(greatest((col("sxx") - col("sx") * col("sx") / 7.0) / 6.0, lit(0.0)))
      val z = when(sd === 0.0, 0.0).otherwise((col("x") - mean) / sd)
      ordered(stats.filter(col("rn") >= 7)
        .select(col("event_type"), col("bucket"), col("x"),
          z.as("z"), (abs(z) > 2.0).as("is_anomaly")))
    },
    "q_sessionize" -> { (s, dir) =>
      // 30-min inactivity-gap sessions per user, batch formulation:
      // lag → gap flag → running sum = session ordinal → group.
      // Ties (equal ts per user) ordered by event_id for determinism.
      val e = Tables(s, dir, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val flagged = e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      // Session bounds as epoch-second BIGINTs (like q_time_tumbling's
      // bucket_start): the driver's pandas comparator hashes BIGINT
      // exactly, whereas pass-through timestamps round-trip through
      // engine-specific physical types.
      ordered(flagged.groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).cast("long").as("session_start"),
          max(col("ts")).cast("long").as("session_end"),
          count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value")))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_time_tumbling" ->
      ("""SELECT (epoch_us(ts)//1000000//3600)*3600 AS bucket_start,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1""".stripMargin +
        orderByAll("bucket_start", "n_events", "sum_value", "n_users")),
    "q_time_sliding" ->
      ("""SELECT (epoch_us(ts)//1000000//900)*900 - k.k*900 AS bucket_start,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) k
        |GROUP BY 1""".stripMargin +
        orderByAll("bucket_start", "n_events", "sum_value")),
    "q_time_interp" ->
      ("""WITH hourly AS (
        |  SELECT event_type, epoch_us(ts)//1000000//3600*3600 AS bucket,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(MIN(bucket), MAX(bucket), 3600)) AS bucket
        |  FROM hourly GROUP BY event_type),
        |joined AS (
        |  SELECT s.event_type, s.bucket, h.x,
        |    last_value(h.x IGNORE NULLS) OVER (PARTITION BY s.event_type
        |      ORDER BY s.bucket ROWS UNBOUNDED PRECEDING) AS pv,
        |    last_value(CASE WHEN h.x IS NOT NULL THEN s.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY s.event_type ORDER BY s.bucket
        |        ROWS UNBOUNDED PRECEDING) AS pb,
        |    first_value(h.x IGNORE NULLS) OVER (PARTITION BY s.event_type
        |      ORDER BY s.bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN h.x IS NOT NULL THEN s.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY s.event_type ORDER BY s.bucket
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM spine s LEFT JOIN hourly h USING (event_type, bucket))
        |SELECT event_type, bucket, x IS NULL AS interpolated,
        |  CASE WHEN x IS NOT NULL THEN x
        |       ELSE pv + (nv - pv) *
        |         (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)) END AS y
        |FROM joined""".stripMargin +
        orderByAll("event_type", "bucket", "interpolated", "y")),
    "q_time_gap_fill" ->
      ("""WITH e AS (SELECT user_id,
        |    (epoch_us(ts)//1000000//3600)*3600 AS bucket, value
        |  FROM events WHERE user_id < 50),
        |a AS (SELECT user_id, bucket, COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM e GROUP BY user_id, bucket),
        |b AS (SELECT user_id, MIN(bucket) AS mn, MAX(bucket) AS mx
        |  FROM e GROUP BY user_id),
        |spine AS (SELECT user_id, unnest(generate_series(mn, mx, 3600)) AS bucket
        |  FROM b),
        |j AS (SELECT s.user_id AS user_id, s.bucket AS bucket,
        |    CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
        |    COALESCE(CAST(CAST(a.sv AS VARCHAR) AS DOUBLE), 0.0) AS sum_value
        |  FROM spine s LEFT JOIN a ON s.user_id = a.user_id AND s.bucket = a.bucket)
        |SELECT user_id, bucket, n_events, sum_value FROM j""".stripMargin +
        orderByAll("user_id", "bucket", "n_events", "sum_value")),
    "q_time_funnel" ->
      ("""WITH e AS (SELECT user_id, event_type,
        |    epoch_us(ts)//1000000 AS sec FROM events),
        |v AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN sec END) AS t_view
        |  FROM e GROUP BY user_id),
        |c AS (SELECT v.user_id, v.t_view,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.sec > v.t_view
        |        THEN e.sec END) AS t_click
        |  FROM v JOIN e ON e.user_id = v.user_id GROUP BY v.user_id, v.t_view),
        |p AS (SELECT c.user_id, c.t_view, c.t_click,
        |    MIN(CASE WHEN e.event_type = 'purchase' AND e.sec > c.t_click
        |        THEN e.sec END) AS t_purch
        |  FROM c JOIN e ON e.user_id = c.user_id
        |  GROUP BY c.user_id, c.t_view, c.t_click)
        |SELECT 1 AS stage, 'view' AS step, COUNT(t_view) AS n_users FROM p
        |UNION ALL
        |SELECT 2, 'click', COUNT(t_click) FROM p
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(t_purch) FROM p""".stripMargin +
        orderByAll("stage", "step", "n_users")),
    "q_agg_retention" ->
      ("""WITH e AS (SELECT DISTINCT user_id,
        |    epoch_us(ts)//1000000//604800 AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id)
        |SELECT f.cohort, e.wk - f.cohort AS week_offset,
        |  COUNT(DISTINCT e.user_id) AS n_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY f.cohort, e.wk - f.cohort""".stripMargin +
        orderByAll("cohort", "week_offset", "n_users")),
    "q_time_ohlc" ->
      ("""WITH b AS (
        |  SELECT epoch_us(ts)//1000000//3600*3600 AS bucket,
        |    ts, event_id, value
        |  FROM events),
        |w AS (
        |  SELECT bucket, value,
        |    first_value(value) OVER (PARTITION BY bucket
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS o,
        |    last_value(value) OVER (PARTITION BY bucket
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
        |  FROM b)
        |SELECT bucket,
        |  MIN(o) AS open, MAX(c) AS close,
        |  MIN(value) AS low, MAX(value) AS high,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    AS volume
        |FROM w GROUP BY bucket""".stripMargin +
        orderByAll("bucket", "open", "close", "low", "high",
          "n_events", "volume")),
    "q_event_attribution" ->
      ("""WITH m AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    last_value(CASE WHEN event_type IN ('click', 'view')
        |      THEN struct_pack(tsec := epoch_us(ts)//1000000,
        |        ttype := event_type, tid := event_id) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS lt
        |  FROM events),
        |p AS (
        |  SELECT user_id, value, lt,
        |    (lt IS NOT NULL AND epoch_us(ts)//1000000 - lt.tsec <= 259200) AS attributed
        |  FROM m WHERE event_type = 'purchase')
        |SELECT CASE WHEN attributed THEN lt.ttype ELSE 'none' END AS touch_type,
        |  attributed, COUNT(*) AS n_purchases,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM p GROUP BY 1, 2""".stripMargin +
        orderByAll("touch_type", "attributed", "n_purchases", "n_users",
          "revenue")),
    "q_event_transitions" ->
      ("""WITH l AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type,
        |  COUNT(*) AS n_transitions,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY prev_type, event_type""".stripMargin +
        orderByAll("prev_type", "event_type", "n_transitions", "n_users")),
    "q_time_trend" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400 AS day,
        |    CAST(floor(SUM(CAST(value AS DECIMAL(18,4)))) AS BIGINT) AS y
        |  FROM events GROUP BY event_type, epoch_us(ts)//1000000//86400),
        |b AS (
        |  SELECT event_type, day - MIN(day) OVER (PARTITION BY event_type) AS t, y
        |  FROM daily),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(t AS HUGEINT)) AS HUGEINT) AS st,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(t AS HUGEINT)*t) AS HUGEINT) AS stt,
        |    CAST(SUM(CAST(y AS HUGEINT)*y) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(t AS HUGEINT)*y) AS HUGEINT) AS sty
        |  FROM b GROUP BY event_type)
        |SELECT event_type, n,
        |  CASE WHEN n*stt - st*st > 0
        |    THEN CAST(CAST(n*sty - st*sy AS VARCHAR) AS DOUBLE)
        |      / CAST(CAST(n*stt - st*st AS VARCHAR) AS DOUBLE)
        |    ELSE NULL END AS slope,
        |  CASE WHEN n*stt - st*st > 0
        |    THEN (CAST(CAST(sy AS VARCHAR) AS DOUBLE) -
        |      (CAST(CAST(n*sty - st*sy AS VARCHAR) AS DOUBLE)
        |        / CAST(CAST(n*stt - st*st AS VARCHAR) AS DOUBLE))
        |        * CAST(CAST(st AS VARCHAR) AS DOUBLE)) / CAST(n AS DOUBLE)
        |    ELSE NULL END AS intercept,
        |  CASE WHEN n*stt - st*st > 0 AND n*syy - sy*sy > 0
        |    THEN (CAST(CAST(n*sty - st*sy AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(n*sty - st*sy AS VARCHAR) AS DOUBLE)) /
        |      (CAST(CAST(n*stt - st*st AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(n*syy - sy*sy AS VARCHAR) AS DOUBLE))
        |    ELSE NULL END AS r2
        |FROM m""".stripMargin +
        orderByAll("event_type", "n", "slope", "intercept", "r2")),
    "q_time_cusum" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400 AS day,
        |    CAST(floor(SUM(CAST(value AS DECIMAL(18,4)))) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, epoch_us(ts)//1000000//86400),
        |ref AS (
        |  SELECT event_type, CAST(SUM(x) // COUNT(*) AS BIGINT) AS mu
        |  FROM daily GROUP BY event_type),
        |j AS (
        |  SELECT d.event_type, d.day, d.x, r.mu, r.mu // 20 AS k
        |  FROM daily d JOIN ref r ON d.event_type = r.event_type),
        |c1 AS (
        |  SELECT event_type, day, x, mu,
        |    SUM(x - mu - k) OVER w AS rp,
        |    SUM(mu - k - x) OVER w AS rn_
        |  FROM j
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING)),
        |c AS (
        |  SELECT event_type, day, x, mu, rp, rn_,
        |    MIN(rp) OVER w AS mrp, MIN(rn_) OVER w AS mrn
        |  FROM c1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING))
        |SELECT event_type, day, x, mu,
        |  CAST(rp - LEAST(mrp, 0) AS BIGINT) AS s_pos,
        |  CAST(rn_ - LEAST(mrn, 0) AS BIGINT) AS s_neg,
        |  (rp - LEAST(mrp, 0) > mu // 2 OR rn_ - LEAST(mrn, 0) > mu // 2) AS alarm
        |FROM c""".stripMargin +
        orderByAll("event_type", "day", "x", "mu", "s_pos", "s_neg", "alarm")),
    "q_time_seasonal" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400 AS day,
        |    CAST(floor(SUM(CAST(value AS DECIMAL(18,4)))) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, epoch_us(ts)//1000000//86400),
        |bydow AS (
        |  SELECT event_type, (day + 3) % 7 AS dow, COUNT(*) AS n_days,
        |    CAST(SUM(x) AS BIGINT) AS tot
        |  FROM daily GROUP BY event_type, (day + 3) % 7),
        |bytype AS (
        |  SELECT event_type, COUNT(*) AS n_all, CAST(SUM(x) AS BIGINT) AS tot_all
        |  FROM daily GROUP BY event_type)
        |SELECT d.event_type AS event_type, CAST(d.dow AS BIGINT) AS dow, d.n_days, d.tot,
        |  CAST(d.tot AS DOUBLE) / CAST(d.n_days AS DOUBLE) AS dow_mean,
        |  (CAST(d.tot AS DOUBLE) / CAST(d.n_days AS DOUBLE)) /
        |    (CAST(t.tot_all AS DOUBLE) / CAST(t.n_all AS DOUBLE)) AS ratio_vs_mean
        |FROM bydow d JOIN bytype t ON d.event_type = t.event_type""".stripMargin +
        orderByAll("event_type", "dow", "n_days", "tot", "dow_mean",
          "ratio_vs_mean")),
    "q_time_autocorr" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400*86400 AS bucket,
        |    CAST(floor(SUM(CAST(value AS DECIMAL(18,4)))) AS BIGINT) AS x
        |  FROM events GROUP BY event_type, epoch_us(ts)//1000000//86400*86400),
        |l AS (
        |  SELECT event_type, x,
        |    lag(x, 1) OVER w AS y1, lag(x, 2) OVER w AS y2, lag(x, 3) OVER w AS y3
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |p AS (
        |  SELECT event_type, CAST(1 AS BIGINT) AS lag, x, y1 AS y FROM l
        |  UNION ALL SELECT event_type, 2, x, y2 FROM l
        |  UNION ALL SELECT event_type, 3, x, y3 FROM l),
        |m AS (
        |  SELECT event_type, lag, COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(x AS HUGEINT)*x) AS HUGEINT) AS sxx,
        |    CAST(SUM(CAST(y AS HUGEINT)*y) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(x AS HUGEINT)*y) AS HUGEINT) AS sxy
        |  FROM p WHERE y IS NOT NULL GROUP BY event_type, lag)
        |SELECT event_type, lag, n,
        |  CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0 THEN
        |    CAST(CAST(n*sxy - sx*sy AS VARCHAR) AS DOUBLE) /
        |      (sqrt(CAST(CAST(n*sxx - sx*sx AS VARCHAR) AS DOUBLE))
        |        * sqrt(CAST(CAST(n*syy - sy*sy AS VARCHAR) AS DOUBLE)))
        |  ELSE NULL END AS autocorr
        |FROM m""".stripMargin +
        orderByAll("event_type", "lag", "n", "autocorr")),
    "q_time_ewma" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400*86400 AS bucket,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |      / COUNT(*) AS x
        |  FROM events
        |  GROUP BY event_type, epoch_us(ts)//1000000//86400*86400),
        |l AS (
        |  SELECT event_type, bucket, x, row_number() OVER w AS rn,
        |    (x
        |      + lag(x, 1) OVER w * 0.5
        |      + lag(x, 2) OVER w * 0.25
        |      + lag(x, 3) OVER w * 0.125
        |      + lag(x, 4) OVER w * 0.0625
        |      + lag(x, 5) OVER w * 0.03125
        |      + lag(x, 6) OVER w * 0.015625
        |      + lag(x, 7) OVER w * 0.0078125) / 1.9921875 AS ewma
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT event_type, bucket, x, ewma FROM l WHERE rn >= 8""".stripMargin +
        orderByAll("event_type", "bucket", "x", "ewma")),
    "q_time_anomaly" ->
      ("""WITH daily AS (
        |  SELECT event_type, epoch_us(ts)//1000000//86400*86400 AS bucket,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS dec
        |  FROM events
        |  GROUP BY event_type, epoch_us(ts)//1000000//86400*86400),
        |w AS (
        |  SELECT event_type, bucket, row_number() OVER ww AS rn,
        |    CAST(CAST(SUM(dec) OVER wf AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(dec AS DECIMAL(18,4)) * CAST(dec AS DECIMAL(18,4)))
        |      OVER wf AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(dec AS VARCHAR) AS DOUBLE) AS x
        |  FROM daily
        |  WINDOW ww AS (PARTITION BY event_type ORDER BY bucket),
        |         wf AS (PARTITION BY event_type ORDER BY bucket
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, x,
        |  CASE WHEN sqrt(greatest((sxx - sx*sx/7.0)/6.0, 0.0)) = 0 THEN 0.0
        |       ELSE (x - sx/7.0) / sqrt(greatest((sxx - sx*sx/7.0)/6.0, 0.0)) END AS z,
        |  abs(CASE WHEN sqrt(greatest((sxx - sx*sx/7.0)/6.0, 0.0)) = 0 THEN 0.0
        |       ELSE (x - sx/7.0) / sqrt(greatest((sxx - sx*sx/7.0)/6.0, 0.0)) END) > 2.0
        |    AS is_anomaly
        |FROM w WHERE rn >= 7""".stripMargin +
        orderByAll("event_type", "bucket", "x", "z", "is_anomaly")),
    "q_sessionize" ->
      ("""WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts)//1000000 - epoch_us(lag(ts) OVER w)//1000000 > 1800
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  CAST(epoch_us(MIN(ts))//1000000 AS BIGINT) AS session_start,
        |  CAST(epoch_us(MAX(ts))//1000000 AS BIGINT) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin +
        orderByAll("user_id", "session_id", "session_start", "session_end",
          "n_events", "sum_value"))
  )
}
