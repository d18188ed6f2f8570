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
