package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B8 — scalar function families (SURVEY.md §2). All row-level and
  * codegen'd builtins — no UDFs in these paths; every expression stays
  * inside WholeStageCodegen and is pushdown/prune-friendly.
  *
  * Cross-engine notes baked into the oracle twins:
  *  - Spark floor/ceil return LONG, DuckDB DOUBLE → cast in oracle;
  *  - Spark dayofweek is Sun=1, DuckDB dow is Sun=0 → dow+1;
  *  - Spark date_part('year') is INT, DuckDB BIGINT → cast;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark;
  *  - double→int casts avoided entirely (Spark truncates, DuckDB
  *    rounds — semantics differ, so the engine exposes trunc/floor
  *    instead). */
object Scalars {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_basic" -> { (s, dir) =>
      ordered(Tables(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 10, 5).as("sub"),
        trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"),
        lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
        length(col("c_name")).as("len"),
        regexp_replace(col("c_name"), lit("Customer#"), lit("C")).as("repl")))
    },
    "q_str_regex" -> { (s, dir) =>
      ordered(Tables(s, dir, "part").select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        col("p_name").rlike("widget|bolt").as("is_wb"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("novowel")))
    },
    "q_str_split_explode" -> { (s, dir) =>
      ordered(Tables(s, dir, "part")
        .select(explode(split(col("p_name"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n")))
    },
    "q_str_distance" -> { (s, dir) =>
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      ordered(n.join(broadcast(r), n("n_regionkey") === r("r_regionkey")).select(
        col("n_name"), col("r_name"),
        levenshtein(col("n_name"), col("r_name")).as("lev")))
    },
    "q_date_funcs" -> { (s, dir) =>
      ordered(Tables(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        dayofweek(col("o_orderdate")).as("dow1"),
        date_trunc("MONTH", col("o_orderdate")).as("month_start"),
        datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01")))
          .cast("long").as("days_since")))
    },
    "q_math_funcs" -> { (s, dir) =>
      ordered(Tables(s, dir, "events").select(
        col("event_id"),
        abs(col("value") - 245.0).as("a"),
        floor(col("value")).as("fl"),
        ceil(col("value")).as("ce"),
        sqrt(col("value")).as("sq"),
        round(pow(col("value"), 2.0), 6).as("p2"),
        // ln/exp are libm calls — engines differ by 1 ulp; round 6dp
        round(log(col("value") + 1.0), 6).as("ln1"),
        round(exp(col("value") / 500.0), 6).as("ex"),
        (col("event_id") % 97).as("m97"),
        signum(col("value") - 245.0).as("sg")))
    },
    "q_cond_funcs" -> { (s, dir) =>
      ordered(Tables(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 100000.0, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
        least(col("o_totalprice"), lit(150000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(1000.0)).as("floored")))
    },
    "q_cast_types" -> { (s, dir) =>
      ordered(Tables(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        lit("42").cast("int").as("i42"),
        col("o_custkey").cast("double").as("cust_d"),
        col("o_totalprice").cast(Money).cast("string").as("price_dec_str"),
        col("o_orderdate").cast("date").as("odate"),
        unix_timestamp(col("o_orderdate")).as("epoch_s")))
    },
    "q_array_funcs" -> { (s, dir) =>
      // Array-valued intermediates (slice/transform) are collapsed to
      // scalar left-fold sums in the FINAL projection: the driver's
      // pandas comparator cannot hash array cells (r1 checker crash).
      // slice/transform/aggregate coverage is unchanged — only the
      // output representation is scalar.
      val emb = col("embedding")
      ordered(Tables(s, dir, "embeddings").select(
        col("vec_id"),
        size(emb).as("dim"),
        element_at(emb, 1).cast("double").as("e1"),
        aggregate(slice(emb, 1, 3), lit(0.0),
          (acc, x) => acc + x.cast("double")).as("head3_sum"),
        array_max(emb).cast("double").as("mx"),
        array_min(emb).cast("double").as("mn"),
        aggregate(transform(emb, x => x.cast("double") * 2.0), lit(0.0),
          (acc, x) => acc + x).as("doubled_sum"),
        aggregate(emb, lit(0.0),
          (acc, x) => acc + x.cast("double")).as("sum_all")))
    },
    "q_array_hof" -> { (s, dir) =>
      // Predicate higher-order functions (filter/exists/forall) over
      // the token array — the trio q_array_funcs doesn't exercise.
      // All lambdas run inside whole-stage codegen as a narrow map
      // (zero shuffle); array intermediates never leave the row, and
      // outputs are scalars/strings for the driver's comparator.
      val toks = expr("filter(split(text, ' '), t -> t <> '')")
      ordered(Tables(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_tok"),
        size(filter(toks, t => length(t) > 6)).as("n_long"),
        exists(toks, t => t.contains("e")).as("has_e"),
        forall(toks, t => t.rlike("^[a-z]+$")).as("all_lower"),
        array_join(transform(slice(toks, 1, 3), t => upper(t)), ",").as("first3")))
    },
    "q_map_funcs" -> { (s, dir) =>
      // build a map from the JSON props, then extract scalars; map/array
      // outputs are serialized to strings for the driver's comparator
      val m = map_from_arrays(
        array(lit("k")),
        array(get_json_object(col("props"), "$.k").cast("int")))
      ordered(Tables(s, dir, "events")
        .withColumn("m", m)
        .select(
          col("event_id"),
          array_join(map_keys(col("m")), ",").as("ks"),
          element_at(col("m"), "k").as("v")))
    },
    "q_json_funcs" -> { (s, dir) =>
      ordered(Tables(s, dir, "events").select(
        col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
        .filter(col("k") >= 50))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_str_basic" ->
      ("""SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substring(c_name, 10, 5) AS sub,
        |  trim('  ' || c_mktsegment || ' ') AS trimmed,
        |  lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |  length(c_name) AS len,
        |  replace(c_name, 'Customer#', 'C') AS repl
        |FROM customer""".stripMargin +
        orderByAll("c_custkey", "up", "lo", "sub", "trimmed", "padded", "len", "repl")),
    "q_str_regex" ->
      ("""SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_matches(p_name, 'widget|bolt') AS is_wb,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel
        |FROM part""".stripMargin +
        orderByAll("p_partkey", "first_word", "is_wb", "novowel")),
    "q_str_split_explode" ->
      ("""SELECT token, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS token FROM part)
        |GROUP BY token""".stripMargin +
        orderByAll("token", "n")),
    "q_str_distance" ->
      ("""SELECT n_name, r_name, levenshtein(n_name, r_name) AS lev
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin +
        orderByAll("n_name", "r_name", "lev")),
    "q_date_funcs" ->
      ("""SELECT o_orderkey,
        |  CAST(date_part('year', o_orderdate) AS INT) AS y,
        |  CAST(date_part('month', o_orderdate) AS INT) AS m,
        |  CAST(date_part('day', o_orderdate) AS INT) AS d,
        |  CAST(date_part('dow', o_orderdate) + 1 AS INT) AS dow1,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders""".stripMargin +
        orderByAll("o_orderkey", "y", "m", "d", "dow1", "month_start", "days_since")),
    "q_math_funcs" ->
      ("""SELECT event_id,
        |  abs(value - 245.0) AS a,
        |  CAST(floor(value) AS BIGINT) AS fl,
        |  CAST(ceil(value) AS BIGINT) AS ce,
        |  sqrt(value) AS sq,
        |  ROUND(power(value, 2.0), 6) AS p2,
        |  ROUND(ln(value + 1.0), 6) AS ln1,
        |  ROUND(exp(value / 500.0), 6) AS ex,
        |  event_id % 97 AS m97,
        |  CAST(sign(value - 245.0) AS DOUBLE) AS sg
        |FROM events""".stripMargin +
        orderByAll("event_id", "a", "fl", "ce", "sq", "p2", "ln1", "ex", "m97", "sg")),
    "q_cond_funcs" ->
      ("""SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |       WHEN o_totalprice > 100000.0 THEN 'mid'
        |       ELSE 'low' END AS tier,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  least(o_totalprice, 150000.0) AS capped,
        |  greatest(o_totalprice, 1000.0) AS floored
        |FROM orders""".stripMargin +
        orderByAll("o_orderkey", "tier", "status2", "capped", "floored")),
    "q_cast_types" ->
      ("""SELECT o_orderkey,
        |  CAST(o_orderkey AS VARCHAR) AS key_str,
        |  CAST('42' AS INT) AS i42,
        |  CAST(o_custkey AS DOUBLE) AS cust_d,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS VARCHAR) AS price_dec_str,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders""".stripMargin +
        orderByAll("o_orderkey", "key_str", "i42", "cust_d", "price_dec_str", "odate", "epoch_s")),
    "q_array_funcs" ->
      ("""SELECT vec_id,
        |  CAST(len(embedding) AS INT) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS e1,
        |  list_sum(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))) AS head3_sum,
        |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS mx,
        |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS mn,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0)) AS doubled_sum,
        |  list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS sum_all
        |FROM embeddings""".stripMargin +
        orderByAll("vec_id", "dim", "e1", "head3_sum", "mx", "mn", "doubled_sum", "sum_all")),
    "q_array_hof" ->
      ("""SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_tok,
        |  CAST(len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |    t -> length(t) > 6)) AS INT) AS n_long,
        |  len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |    t -> contains(t, 'e'))) > 0 AS has_e,
        |  len(list_filter(list_filter(string_split(text, ' '), t -> t <> ''),
        |    t -> NOT regexp_matches(t, '^[a-z]+$'))) = 0 AS all_lower,
        |  array_to_string(list_transform(
        |    (list_filter(string_split(text, ' '), t -> t <> ''))[1:3],
        |    t -> upper(t)), ',') AS first3
        |FROM documents""".stripMargin +
        orderByAll("doc_id", "n_tok", "n_long", "has_e", "all_lower", "first3")),
    "q_map_funcs" ->
      ("""SELECT event_id, 'k' AS ks,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS v
        |FROM events""".stripMargin +
        orderByAll("event_id", "ks", "v")),
    "q_json_funcs" ->
      ("""SELECT event_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INT) >= 50""".stripMargin +
        orderByAll("event_id", "event_type", "k"))
  )
}
