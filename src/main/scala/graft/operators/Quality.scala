package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** Data-quality gate (SURVEY.md §2 B4-adjacent, added r2): the audit
  * pass a training pipeline runs before a corpus or fact table is
  * allowed downstream — column profiling (null rate, cardinality,
  * bounds) and constraint checking (FK orphans, key uniqueness, value
  * ranges). Violations are COUNTED, never dropped silently: the gate's
  * contract is a report, the fix policy belongs to the caller.
  *
  * 100 TB posture: profiling is ONE pass over the table — every
  * per-column stat is a conditional aggregate in the same hash agg
  * (no per-column scans); cardinalities come from the same pass via
  * exact distinct on the two audited key columns. Constraint checks
  * are anti-join / hash-agg shapes: the orphan check broadcasts
  * nothing and shuffles each side once on the FK; at 100 TB you'd
  * swap the exact distinct for HLL (q_agg_approx_distinct) per the
  * documented accuracy trade.
  */
object Quality {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pipeline_curation" -> { (s, dir) =>
      // End-to-end curation funnel (added late r9) — the composition
      // story as a GRADED key, not just the Pipeline demo main: the
      // documents corpus flows raw → exact dedup (one survivor per
      // content hash) → near-dup removal (the prefix-filtered
      // Jaccard≥0.8 join, higher doc_id loses) → quality gate
      // (≥10 tokens, ≥60 chars — the Gopher-style floor) →
      // benchmark decontamination (drop the eval split AND any train
      // doc sharing a distinct word 8-gram with it — the GPT-3/Dolma
      // rule), and the key reports the FUNNEL: per stage, surviving
      // doc and token counts. Every stage is an already-oracle-checked
      // operator shape (q_dedup_exact / q_dedup_near_jaccard /
      // q_text_quality / q_text_decontaminate), so the whole
      // composition replays exactly in DuckDB — the report a corpus
      // build publishes with each release.
      //
      // 100 TB posture: the funnel is ONE DAG — each stage is the
      // constituent key's plan (hash-agg dedup, prefix-filtered
      // shingle join, narrow filters, broadcast-able eval shingle
      // set), and the five stage summaries are map-side-partial
      // count/sum aggs unioned at the end; nothing materializes
      // between stages unless the optimizer chooses to (the shingle
      // and pair tables ride the Dedup family's memoized
      // checkpoints).
      graft.functions.VectorExprs.register(s)
      val d = Tables(s, dir, "documents")
      val ntok = size(expr("filter(split(text, ' '), t -> t <> '')"))
      val raw = d.withColumn("n_tok", ntok)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
      // the five stage summaries are UNION branches over a chained
      // funnel, and Spark shares no subtrees across branches — without
      // materialization stage 5's branch re-runs the scan + window
      // dedup + near-dup anti join, stage 4 re-runs all but the
      // decontamination, etc. (5× the scan, 3× the anti join,
      // measured). Pin the two expensive funnel states once (r19,
      // guide §1.2/§5: a real corpus build materializes stage outputs
      // between passes anyway); downstream stages re-derive from the
      // pinned frames with narrow filters.
      val exact = raw.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn").localCheckpoint()
      val nearLosers = Dedup.nearDupPairs(exact)
        .select(col("db").as("doc_id")).distinct()
      val near = exact.join(nearLosers, Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val quality = near.filter(col("n_tok") >= 10 && col("n_chars") >= 60)
      val isEval = md5(col("doc_id").cast("string")) < lit("1a")
      val evalSh = d.filter(isEval).select(
        explode(call_function("word_shingles", split(col("text"), " "), lit(8)))
          .as("sng")).distinct()
      val qSh = quality.filter(!isEval).select(col("doc_id"),
        explode(call_function("word_shingles", split(col("text"), " "), lit(8)))
          .as("sng"))
      val contaminated = qSh.join(evalSh, Seq("sng"), "left_semi")
        .select(col("doc_id")).distinct()
      val decon = quality.filter(!isEval)
        .join(contaminated, Seq("doc_id"), "left_anti")
      def stage(id: Int, name: String, df: DataFrame): DataFrame =
        df.agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok").cast("long")).as("n_tokens"))
          .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"),
            col("n_docs"), col("n_tokens"))
      ordered(stage(1, "raw", raw)
        .union(stage(2, "exact_dedup", exact))
        .union(stage(3, "near_dedup", near))
        .union(stage(4, "quality", quality))
        .union(stage(5, "decontaminated", decon)))
    },
    "q_profile_table" -> { (s, dir) =>
      // single-pass per-column profile of lineitem: nulls are
      // manufactured with nullif (fixtures are null-free) so the null
      // accounting path is actually exercised
      val li = Tables(s, dir, "lineitem")
        .withColumn("rf_n", nullif(col("l_returnflag"), lit("N")))
      val prof = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("rf_n").isNull, 1L).otherwise(0L)).as("rf_nulls"),
        countDistinct(col("l_orderkey")).as("nd_orderkey"),
        countDistinct(col("l_returnflag")).as("nd_returnflag"),
        min(col("l_quantity")).cast("double").as("min_qty"),
        max(col("l_quantity")).cast("double").as("max_qty"))
      ordered(prof.selectExpr(
        "stack(4, " +
          "'rows',        CAST(n_rows AS DOUBLE),        CAST(NULL AS DOUBLE), " +
          "'rf_nulls',    CAST(rf_nulls AS DOUBLE),      CAST(NULL AS DOUBLE), " +
          "'nd_orderkey', CAST(nd_orderkey AS DOUBLE),   CAST(nd_returnflag AS DOUBLE), " +
          "'qty',         min_qty,                       max_qty) " +
          "AS (metric, v1, v2)"))
    },
    "q_quality_classifier" -> { (s, dir) =>
      // Model-based quality scoring, the fasttext-style linear
      // classifier a curation pipeline runs per doc (the CCNet/GPT-3
      // "quality model" stage) — here with a FIXED, shipped weight
      // vector over integer features so the score is a pure function
      // of the text: stopword density and unique-token ratio reward
      // natural prose, digit-token density and out-of-band length
      // penalize boilerplate/noise. Everything is integer arithmetic
      // (densities as per-mille via integer DIV), so score and band
      // replay exactly in any engine; swapping in LEARNED weights
      // changes the literals, not the plan. 100 TB posture: pure
      // narrow map over the corpus (features + dot product at scan
      // speed), then a |bands|-row hash agg — nothing shuffles but
      // the report.
      val d = Tables(s, dir, "documents")
        .withColumn("t", expr("filter(split(text, ' '), x -> x <> '')"))
        .withColumn("n_tok", size(col("t")))
        .filter(col("n_tok") > 0)
        .withColumn("stop_cnt", expr(
          s"size(filter(t, x -> array_contains(array${Text.Markers.en.mkString("('", "', '", "')")}, x)))"))
        .withColumn("digit_cnt", expr("size(filter(t, x -> x rlike '^[0-9]+$'))"))
        .withColumn("stop_ppt", expr("CAST(stop_cnt * 1000 AS BIGINT) DIV n_tok"))
        .withColumn("uniq_ppt", expr("CAST(size(array_distinct(t)) * 1000 AS BIGINT) DIV n_tok"))
        .withColumn("len_pen", when(col("n_tok") < 20, 500L)
          .when(col("n_tok") > 400, 300L).otherwise(0L))
        .withColumn("score",
          lit(2L) * col("stop_ppt") + col("uniq_ppt")
            - col("len_pen") - lit(5L) * col("digit_cnt"))
        .withColumn("band", when(col("score") >= 1400L, "high")
          .when(col("score") >= 900L, "mid").otherwise("low"))
      ordered(d.select(col("doc_id"), col("n_tok").cast("long").as("n_tok"),
        col("stop_ppt"), col("uniq_ppt"), col("score"), col("band")))
    },
    "q_quality_drift" -> { (s, dir) =>
      // Distribution-drift gate (added r9) — the Population Stability
      // Index check a training pipeline runs between data windows
      // before retraining (the classic "did the feature distribution
      // move" monitor): PSI = Σ_buckets (p−q)·ln(p/q) between the
      // first and second half-month of events, per event_type, over 10
      // equal-width value buckets with Laplace (+1) smoothing so every
      // ln argument is a positive INTEGER product.
      //
      // Determinism (the q_text_entropy fixed-point pattern): with
      // a = cs1·N2 and b = cs2·N1 (smoothed count × opposite total,
      // exact BIGINTs), each bucket term is the INTEGER product
      // (a−b)·(floor(1e6·ln a) − floor(1e6·ln b)) — ln on integer-
      // valued doubles, floor-quantized, so the Σ is an exact BIGINT
      // in any engine and psi is ONE shared double expression over it;
      // the 0.1 drift verdict compares integers only. Drift is
      // MANUFACTURED for one type (second-window purchase values ×0.25
      // — exact in IEEE) so the drifted=true path provably fires;
      // ambient types land at psi < 0.01 (drifted=false path).
      //
      // 100 TB posture: ONE scan of events collapsed by a
      // (type, window, bucket) hash agg with map-side partials —
      // everything after is |types×buckets| rows (50); the bucket grid
      // is explode(sequence), not a cartesian, and the window-count
      // joins broadcast.
      val ev = Tables(s, dir, "events").select(
        col("event_type"),
        expr("CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END").as("w"),
        expr("CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16 00:00:00' " +
          "THEN value * CAST(0.25 AS DOUBLE) ELSE value END").as("v"))
      val b = ev
        .withColumn("bucket",
          expr("LEAST(9, GREATEST(0, CAST(floor(v / CAST(50 AS DOUBLE)) AS INT)))"))
        .groupBy(col("event_type"), col("w"), col("bucket"))
        .agg(count(lit(1)).as("c"))
      val grid = ev.select(col("event_type")).distinct()
        .select(col("event_type"), explode(expr("sequence(0, 9)")).as("bucket"))
      val f = grid
        .join(b.filter(col("w") === 0).select(col("event_type"), col("bucket"),
          col("c").as("c1")), Seq("event_type", "bucket"), "left")
        .join(b.filter(col("w") === 1).select(col("event_type"), col("bucket"),
          col("c").as("c2")), Seq("event_type", "bucket"), "left")
        .select(col("event_type"),
          (coalesce(col("c1"), lit(0L)) + 1L).as("cs1"),
          (coalesce(col("c2"), lit(0L)) + 1L).as("cs2"))
      val n = f.groupBy(col("event_type"))
        .agg(sum(col("cs1")).as("n1"), sum(col("cs2")).as("n2"))
      val t = f.join(n, Seq("event_type"))
        .withColumn("termS", expr(
          "(cs1 * n2 - cs2 * n1) * " +
            "(CAST(floor(1e6 * ln(CAST(cs1 * n2 AS DOUBLE))) AS BIGINT) - " +
            " CAST(floor(1e6 * ln(CAST(cs2 * n1 AS DOUBLE))) AS BIGINT))"))
        .groupBy(col("event_type"))
        .agg(sum(col("termS")).as("s"), min(col("n1")).as("n1"), min(col("n2")).as("n2"))
      ordered(t.select(col("event_type"),
        (col("n1") - 10).as("n_first"), (col("n2") - 10).as("n_second"),
        expr("CAST(s AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 1e6)").as("psi"),
        expr("(10 * s) > (n1 * n2 * 1000000)").as("drifted")))
    },
    "q_quality_audit" -> { (s, dir) =>
      // three constraint families over the TPC-H-ish schema, one count
      // per rule; orphans are manufactured (drop a slice of orders)
      // so the anti-join path provably fires
      // one lazy plan (4 aggregate branches unioned), nothing touches
      // the driver — the report stays a DataFrame like every other key
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders").filter(col("o_orderkey") % 10 =!= 0)
      def rule(name: String, d: DataFrame): DataFrame =
        d.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("rule"), col("n_violations"))
      val orphans = rule("fk_orphan_lineitems",
        li.join(o.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti"))
      val dupKeys = rule("dup_line_keys",
        li.groupBy(col("l_orderkey"), col("l_linenumber"))
          .count().filter(col("count") > 1))
      val badDisc = rule("discount_out_of_range",
        li.filter(col("l_discount") < 0.0 || col("l_discount") > 0.1))
      val badQty = rule("quantity_out_of_range",
        li.filter(col("l_quantity") <= 0.0 || col("l_quantity") > 50.0))
      ordered(orphans.union(dupKeys).union(badDisc).union(badQty))
    }
  )

  def oracle: Map[String, String] = Map(
    // each funnel stage replays its constituent key's validated
    // oracle fragment: md5-window exact dedup, 3-gram Jaccard pairs
    // (inter*5 >= uni*4 ⇔ J >= 0.8), the quality floor, and the
    // distinct-8-gram decontamination rule
    "q_pipeline_curation" ->
      ("""WITH t AS (SELECT doc_id, text, n_chars, md5(text) AS h,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS tk,
        |    (md5(CAST(doc_id AS VARCHAR)) < '1a') AS is_eval
        |  FROM documents),
        |ex AS (SELECT * FROM (
        |    SELECT t.*, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |    FROM t) WHERE rn = 1),
        |shx AS (SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(tk)-1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
        |  FROM ex WHERE len(tk) >= 3),
        |losers AS (SELECT DISTINCT b.doc_id
        |  FROM shx a JOIN shx b ON a.doc_id < b.doc_id
        |  WHERE len(list_intersect(a.sh, b.sh)) * 5 >=
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) * 4),
        |nr AS (SELECT * FROM ex
        |  WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
        |ql AS (SELECT * FROM nr WHERE len(tk) >= 10 AND n_chars >= 60),
        |esh AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, len(tk)-6), i -> list_aggregate(tk[i:i+7], 'string_agg', ' ')))) AS sng
        |  FROM t WHERE is_eval AND len(tk) >= 8),
        |qsh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(tk)-6), i -> list_aggregate(tk[i:i+7], 'string_agg', ' ')))) AS sng
        |  FROM ql WHERE NOT is_eval AND len(tk) >= 8),
        |cont AS (SELECT DISTINCT doc_id FROM qsh
        |  WHERE sng IN (SELECT sng FROM esh)),
        |dc AS (SELECT * FROM ql WHERE NOT is_eval
        |  AND doc_id NOT IN (SELECT doc_id FROM cont)),
        |f AS (
        |  SELECT 1 AS sid, 'raw' AS stage, COUNT(*) AS n_docs,
        |    CAST(SUM(len(tk)) AS BIGINT) AS n_tokens FROM t
        |  UNION ALL SELECT 2, 'exact_dedup', COUNT(*),
        |    CAST(SUM(len(tk)) AS BIGINT) FROM ex
        |  UNION ALL SELECT 3, 'near_dedup', COUNT(*),
        |    CAST(SUM(len(tk)) AS BIGINT) FROM nr
        |  UNION ALL SELECT 4, 'quality', COUNT(*),
        |    CAST(SUM(len(tk)) AS BIGINT) FROM ql
        |  UNION ALL SELECT 5, 'decontaminated', COUNT(*),
        |    CAST(SUM(len(tk)) AS BIGINT) FROM dc)
        |SELECT CAST(sid AS BIGINT) AS stage_id, stage, n_docs, n_tokens
        |FROM f""".stripMargin +
        orderByAll("stage_id", "stage", "n_docs", "n_tokens")),
    "q_profile_table" ->
      ("""WITH p AS (SELECT COUNT(*) AS n_rows,
        |    SUM(CASE WHEN nullif(l_returnflag, 'N') IS NULL THEN 1 ELSE 0 END) AS rf_nulls,
        |    COUNT(DISTINCT l_orderkey) AS nd_orderkey,
        |    COUNT(DISTINCT l_returnflag) AS nd_returnflag,
        |    CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
        |    CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
        |  FROM lineitem)
        |SELECT 'rows' AS metric, CAST(n_rows AS DOUBLE) AS v1, CAST(NULL AS DOUBLE) AS v2 FROM p
        |UNION ALL SELECT 'rf_nulls', CAST(rf_nulls AS DOUBLE), NULL FROM p
        |UNION ALL SELECT 'nd_orderkey', CAST(nd_orderkey AS DOUBLE), CAST(nd_returnflag AS DOUBLE) FROM p
        |UNION ALL SELECT 'qty', min_qty, max_qty FROM p""".stripMargin +
        orderByAll("metric", "v1", "v2")),
    "q_quality_classifier" ->
      (s"""WITH f AS (
        |  SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> x <> '') AS t
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(t) AS n_tok,
        |    len(list_filter(t, x -> list_contains(${Text.Markers.sql(Text.Markers.en)}, x))) AS stop_cnt,
        |    len(list_filter(t, x -> regexp_matches(x, '^[0-9]+$$'))) AS digit_cnt,
        |    len(list_distinct(t)) AS n_uniq
        |  FROM f WHERE len(t) > 0),
        |sc AS (
        |  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
        |    CAST(stop_cnt AS BIGINT) * 1000 // n_tok AS stop_ppt,
        |    CAST(n_uniq AS BIGINT) * 1000 // n_tok AS uniq_ppt,
        |    CASE WHEN n_tok < 20 THEN 500 WHEN n_tok > 400 THEN 300 ELSE 0 END AS len_pen,
        |    CAST(digit_cnt AS BIGINT) AS digit_cnt
        |  FROM g)
        |SELECT doc_id, n_tok, stop_ppt, uniq_ppt,
        |  2 * stop_ppt + uniq_ppt - len_pen - 5 * digit_cnt AS score,
        |  CASE WHEN 2 * stop_ppt + uniq_ppt - len_pen - 5 * digit_cnt >= 1400 THEN 'high'
        |       WHEN 2 * stop_ppt + uniq_ppt - len_pen - 5 * digit_cnt >= 900 THEN 'mid'
        |       ELSE 'low' END AS band
        |FROM sc""".stripMargin +
        orderByAll("doc_id", "n_tok", "stop_ppt", "uniq_ppt", "score", "band")),
    "q_quality_drift" ->
      ("""WITH ev AS (
        |  SELECT event_type,
        |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS w,
        |    CASE WHEN event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-16 00:00:00'
        |         THEN value * CAST(0.25 AS DOUBLE) ELSE value END AS v
        |  FROM events),
        |b AS (
        |  SELECT event_type, w,
        |    LEAST(9, GREATEST(0, CAST(floor(v / CAST(50 AS DOUBLE)) AS INT))) AS bucket,
        |    COUNT(*) AS c
        |  FROM ev GROUP BY event_type, w, bucket),
        |grid AS (
        |  SELECT t.event_type, g.bucket
        |  FROM (SELECT DISTINCT event_type FROM ev) t,
        |       (SELECT unnest(range(0, 10)) AS bucket) g),
        |f AS (
        |  SELECT g.event_type,
        |    COALESCE(c0.c, 0) + 1 AS cs1, COALESCE(c1.c, 0) + 1 AS cs2
        |  FROM grid g
        |  LEFT JOIN b c0 ON c0.event_type = g.event_type AND c0.bucket = g.bucket AND c0.w = 0
        |  LEFT JOIN b c1 ON c1.event_type = g.event_type AND c1.bucket = g.bucket AND c1.w = 1),
        |n AS (
        |  SELECT event_type, CAST(SUM(cs1) AS BIGINT) AS n1, CAST(SUM(cs2) AS BIGINT) AS n2
        |  FROM f GROUP BY event_type),
        |t AS (
        |  SELECT f.event_type,
        |    CAST(SUM((f.cs1 * n.n2 - f.cs2 * n.n1) *
        |      (CAST(floor(1e6 * ln(CAST(f.cs1 * n.n2 AS DOUBLE))) AS BIGINT) -
        |       CAST(floor(1e6 * ln(CAST(f.cs2 * n.n1 AS DOUBLE))) AS BIGINT))) AS BIGINT) AS s,
        |    MIN(n.n1) AS n1, MIN(n.n2) AS n2
        |  FROM f JOIN n ON f.event_type = n.event_type
        |  GROUP BY f.event_type)
        |SELECT event_type, n1 - 10 AS n_first, n2 - 10 AS n_second,
        |  CAST(s AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 1e6) AS psi,
        |  (10 * s) > (n1 * n2 * 1000000) AS drifted
        |FROM t""".stripMargin +
        orderByAll("event_type", "n_first", "n_second", "psi", "drifted")),
    "q_quality_audit" ->
      ("""WITH o AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 10 <> 0)
        |SELECT 'fk_orphan_lineitems' AS rule, CAST(COUNT(*) AS BIGINT) AS n_violations
        |FROM lineitem l LEFT JOIN o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'dup_line_keys', CAST(COUNT(*) AS BIGINT) FROM (
        |  SELECT l_orderkey, l_linenumber FROM lineitem
        |  GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'discount_out_of_range', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |WHERE l_discount < 0.0 OR l_discount > 0.1
        |UNION ALL
        |SELECT 'quantity_out_of_range', CAST(COUNT(*) AS BIGINT) FROM lineitem
        |WHERE l_quantity <= 0.0 OR l_quantity > 50.0""".stripMargin +
        orderByAll("rule", "n_violations"))
  )
}
