package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B4 — aggregations (SURVEY.md §2 Tier B). Each key has a DuckDB
  * oracle twin in [[oracle]]; determinism per Det's rules. */
object Aggregates {
  private val shipCut = "1998-09-01 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_group_pricing" -> { (s, dir) =>
      pricingSummary(Tables(s, dir, "lineitem"))
    },
    "q_agg_global" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      ordered(li.agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"),
        dsum(col("l_discount")).as("sum_disc")))
    },
    "q_agg_distinct" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      ordered(li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n_rows")))
    },
    "q_agg_having" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      ordered(c.groupBy(col("c_mktsegment"))
        .agg(davg(col("c_acctbal")).as("avg_bal"), count(lit(1)).as("n_cust"))
        .filter(col("avg_bal") > lit(4000.0)))
    },
    "q_agg_stats" -> { (s, dir) =>
      // stddev/var/corr/covar derived from EXACT decimal sums so the
      // double formula is IEEE-identical to the oracle's (§7.4).
      val li = Tables(s, dir, "lineitem")
      val sums = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).cast("double").as("n"),
        dsum(col("l_extendedprice")).as("sx"),
        sum(money(col("l_extendedprice")) * money(col("l_extendedprice"))).cast("double").as("sxx"),
        dsum(col("l_discount")).as("sy"),
        sum(money(col("l_discount")) * money(col("l_discount"))).cast("double").as("syy"),
        sum(money(col("l_extendedprice")) * money(col("l_discount"))).cast("double").as("sxy"))
      // NOTE oracle twin uses DECIMAL(24,4)×DECIMAL(14,4): DuckDB 1.0
      // keeps width 18 for (18,4)×(18,4) and overflows int64 on the
      // squares; Spark's (18,4)×(18,4)→(37,8) is already exact.
      ordered(sums.select(
        col("l_returnflag"),
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1.0))).as("sd_price"),
        ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - lit(1.0))).as("var_price"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - lit(1.0))).as("covar_pd"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
           sqrt(col("syy") - col("sy") * col("sy") / col("n")))).as("corr_pd")))
    },
    "q_agg_percentile" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      ordered(o.groupBy(col("o_orderpriority")).agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n")))
    },
    "q_agg_histogram" -> { (s, dir) =>
      // Fixed-width histogram — the distribution-profiling primitive
      // (data-quality dashboards, drift checks). Bucket id is
      // floor(x/width) clamped to the last bucket: pure integer-ish
      // double math, identical in every engine (width_bucket() is not
      // portably specified at the edges). Hash agg → shuffled volume
      // is #buckets.
      val o = Tables(s, dir, "orders")
      val bucket = least(floor(col("o_totalprice") / lit(50000.0)), lit(11.0))
        .cast("int")
      ordered(o.groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price")))
    },
    "q_agg_collect" -> { (s, dir) =>
      // collect_list + numeric array_sort, then serialized to a CSV
      // string: the driver's pandas comparator cannot hash raw array
      // cells (r1 checker crash), and the join preserves the full
      // collect semantics byte-for-byte.
      val o = Tables(s, dir, "orders")
      ordered(o.filter(col("o_custkey") <= lit(50L))
        .groupBy(col("o_custkey"))
        .agg(array_join(transform(array_sort(collect_list(col("o_orderkey"))),
            x => x.cast("string")), ",").as("orderkeys"),
          count(lit(1)).as("n_orders")))
    },
    "q_agg_minmax_by" -> { (s, dir) =>
      // Arg-max with deterministic ties: max over (value, event_id)
      // struct so the winning event is unique.
      val e = Tables(s, dir, "events")
      val top = max(struct(col("value"), col("event_id")))
      ordered(e.groupBy(col("user_id")).agg(
        top.getField("event_id").as("top_event_id"),
        top.getField("value").as("top_value")))
    },
    "q_agg_approx_percentile" -> { (s, dir) =>
      // sketch-based quantiles (the 100 TB default: exact percentile
      // is a full sort per group; approx_percentile is a bounded-size
      // mergeable sketch with partial aggregation). Oracle=omit
      // (sketch internals engine-specific); AggregatesSpec bounds the
      // error vs the exact q_agg_percentile twin.
      val o = Tables(s, dir, "orders")
      ordered(o.groupBy(col("o_orderpriority")).agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 4).as("approx_median"),
        round(expr("approx_percentile(o_totalprice, 0.9, 1000)"), 4).as("approx_p90"),
        count(lit(1)).as("n")))
    },
    "q_agg_approx_distinct" -> { (s, dir) =>
      val e = Tables(s, dir, "events")
      ordered(e.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).as("n")))
    },
    "q_agg_sketch_partial" -> { (s, dir) =>
      // Mergeable HLL sketch partials (Apache DataSketches via
      // hll_sketch_agg / hll_union_agg) — the re-aggregatable distinct
      // architecture at 100 TB: per-nation customer sketches are built
      // once (the shuffle carries fixed ~KB sketch blobs, never raw
      // ids), and any rollup — region here, global, daily→monthly —
      // UNIONS the stored partials without rescanning the fact table.
      // That re-aggregation is exactly what approx_count_distinct's
      // opaque partials can't give you as data. Oracle=omit (sketch
      // binary is engine-internal); AggregatesSpec asserts the merge
      // law (union-of-partials == direct whole-set sketch, exactly)
      // and bounds the estimate error vs exact distinct.
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val partials = c
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(expr("hll_sketch_agg(c_custkey, 12)").as("sk"),
          count(lit(1)).as("n"))
      ordered(partials.groupBy(col("n_regionkey"))
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))")
            .cast("long").as("approx_customers"),
          sum(col("n")).cast("long").as("n_rows"),
          count(lit(1)).as("n_nations")))
    },
    "q_agg_theta_intersect" -> { (s, dir) =>
      // Theta-sketch SET ALGEBRA (Apache DataSketches) — the sketch
      // family that supports intersection/difference, which HLL
      // cannot: "how many users did BOTH event types" without ever
      // shuffling raw ids. Classic partial-sketch pattern: each
      // partition builds one UpdateSketch per group (row cost = one
      // hash update, no serialization), partitions emit compact
      // sketch blobs, a per-group merge unions them, and the k merged
      // sketches (k = |event types|, tiny) pairwise-intersect in a
      // distributed k² map — no driver collect anywhere. At 100 TB
      // the per-group blobs are ~KB and also storable for later
      // re-intersection. Oracle=omit (sketch binary engine-internal);
      // AggregatesSpec: below 4096 retained entries theta sketches
      // are EXACT, so at test scale estimates equal exact overlaps.
      import s.implicits._
      import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
      import org.apache.datasketches.memory.Memory
      val e = Tables(s, dir, "events").select(col("event_type"), col("user_id"))
      val partials = e.as[(String, Long)].mapPartitions { it =>
        val sk = scala.collection.mutable.Map[String, UpdateSketch]()
        it.foreach { case (t, u) =>
          sk.getOrElseUpdate(t, UpdateSketch.builder().build()).update(u)
        }
        sk.iterator.map { case (t, x) => (t, x.compact().toByteArray) }
      }
      val merged = partials.groupByKey(_._1).mapGroups { (t, it) =>
        val un = SetOperation.builder().buildUnion()
        it.foreach { case (_, b) =>
          un.union(Sketches.wrapSketch(Memory.wrap(b)))
        }
        (t, un.getResult.toByteArray)
      }
      val a = merged.toDF("ta", "ska")
      val b = merged.toDF("tb", "skb")
      val out = a.crossJoin(b).filter(col("ta") < col("tb"))
        .as[(String, Array[Byte], String, Array[Byte])]
        .map { case (ta, ska, tb, skb) =>
          val ia = Sketches.wrapSketch(Memory.wrap(ska))
          val ib = Sketches.wrapSketch(Memory.wrap(skb))
          val inter = SetOperation.builder().buildIntersection()
          inter.intersect(ia); inter.intersect(ib)
          val un = SetOperation.builder().buildUnion()
          un.union(ia); un.union(ib)
          (ta, tb, math.round(ia.getEstimate), math.round(ib.getEstimate),
            math.round(inter.getResult.getEstimate),
            math.round(un.getResult.getEstimate))
        }.toDF("ta", "tb", "est_a", "est_b", "est_inter", "est_union")
      ordered(out)
    },
    "q_agg_heavy_hitters" -> { (s, dir) =>
      // Frequent-items / heavy-hitters sketch (Misra-Gries, Apache
      // DataSketches ItemsSketch) — the bounded-memory "top tokens /
      // top domains" pass of a corpus pipeline: exact counting
      // shuffles the full vocabulary; the sketch retains ≤ maxMapSize
      // counters per partition and merges associatively. Partial-
      // sketch pattern as q_agg_theta_intersect; partials merge in
      // PARTITION-ID ORDER so the merged sketch is reproducible
      // run-to-run (Misra-Gries eviction is order-sensitive once
      // saturated). NO_FALSE_NEGATIVES guarantees every item above
      // the error bound survives. This fixture's token vocabulary
      // (31 « 1024 counters) never evicts, so estimates are EXACT and
      // the key is oracle-checked against plain token counts — at
      // real-corpus vocabularies the same plan degrades gracefully to
      // (est, lb, ub) bounds.
      import s.implicits._
      import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
      import org.apache.datasketches.common.ArrayOfStringsSerDe
      import org.apache.datasketches.memory.Memory
      val toks = Tables(s, dir, "documents")
        .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("tok"))
      val partials = toks.as[String].mapPartitions { it =>
        val sk = new ItemsSketch[String](1024)
        it.foreach(sk.update)
        Iterator.single((org.apache.spark.TaskContext.getPartitionId(),
          sk.toByteArray(new ArrayOfStringsSerDe)))
      }
      val merged = partials.groupByKey(_ => 0).flatMapGroups { (_, it) =>
        val acc = new ItemsSketch[String](1024)
        it.toSeq.sortBy(_._1).foreach { case (_, b) =>
          acc.merge(ItemsSketch.getInstance(
            Memory.wrap(b), new ArrayOfStringsSerDe))
        }
        acc.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES).iterator
          .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      }.toDF("tok", "est", "lb", "ub")
      ordered(merged)
    },
    "q_agg_countmin" -> { (s, dir) =>
      // Count-Min sketch point-frequency estimates (Cormode &
      // Muthukrishnan '05) — the bounded-memory "how often did THIS
      // key occur" primitive (DataSketches ships no CMS, so the d×w
      // counter matrix is built directly). Same partial-sketch plan
      // as the theta/Misra-Gries keys: each partition folds its rows
      // into a local 4×2048 long matrix (one cell increment per row
      // per hash), partitions emit ONE 64 KB blob each, and the merge
      // is an elementwise vector add — associative, commutative, so
      // the estimate is partition-order-independent and the shuffle
      // carries #partitions blobs, never rows. At 100 TB the merged
      // sketch is still 64 KB, queryable on the serving side in O(d).
      // Estimates are deterministic (fixed mix hashes) but
      // sketch-internal → oracle=omit; AggregatesSpec asserts the CMS
      // guarantee est ≥ true and the ε = e/w overcount bound.
      import s.implicits._
      val W = 2048; val D = 4 // ε = e/W ≈ 0.13%, δ = e^-D ≈ 1.8%
      def bucket(x: Long, row: Int): Int = {
        var h = x * 0x9E3779B97F4A7C15L + (row + 1) * 0xC2B2AE3D27D4EB4FL
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        (h & (W - 1)).toInt
      }
      val ids = Tables(s, dir, "events").select(col("user_id")).as[Long]
      val merged = ids.mapPartitions { it =>
        val cells = new Array[Long](D * W)
        it.foreach { u =>
          var r = 0
          while (r < D) { cells(r * W + bucket(u, r)) += 1L; r += 1 }
        }
        Iterator.single(cells)
      }.reduce { (a, b) =>
        var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a
      }
      val est = (0L until 20L).map { u =>
        (u, (0 until D).map(r => merged(r * W + bucket(u, r))).min)
      }
      ordered(est.toDF("user_id", "est_events"))
    },
    "q_agg_mode" -> { (s, dir) =>
      // Deterministic statistical mode per group: Spark's mode() picks
      // an ARBITRARY value on frequency ties, so build it from counts
      // + max_by over a (count, -value) struct — largest count, then
      // SMALLEST value as the tie-break, reproducible on both engines.
      // Two chained hash aggs (value-level counts, then per-group
      // argmax) — no window sort; at 100 TB the first agg's partial
      // combine collapses the value space map-side.
      val li = Tables(s, dir, "lineitem")
      val counts = li.groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("cnt"))
      ordered(counts.groupBy(col("l_returnflag"))
        .agg(max_by(col("l_quantity"),
            struct(col("cnt"), (-col("l_quantity")).as("neg"))).as("mode_qty"),
          max(col("cnt")).as("n_occurrences")))
    },
    "q_agg_bitmap_distinct" -> { (s, dir) =>
      // EXACT distinct counting via bitmap partials (the Druid /
      // ClickHouse / Snowflake BITMAP_COUNT technique): user ids are
      // bucketed into 32k-bit bitmap segments, each (group, bucket)
      // aggregates to a fixed-size bitmap map-side, and the final count
      // is the sum of popcounts. Unlike COUNT(DISTINCT) the shuffle
      // carries compressed set partials, not raw ids (here: one ≤4 KB
      // value per (group, 32k-id range) instead of one row per
      // distinct id), and unlike HLL it is exact. The partials are
      // also mergeable across rollup cells/days — at 100 TB they'd be
      // materialized once and reused by every downstream distinct.
      val e = Tables(s, dir, "events")
      val partials = e.groupBy(col("event_type"),
          expr("bitmap_bucket_number(user_id)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))").as("bm"),
          count(lit(1)).as("n"))
      ordered(partials.groupBy(col("event_type"))
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_users"),
          sum(col("n")).cast("long").as("n_events")))
    }
  )

  /** Flagship: TPC-H-Q1-style pricing summary (SURVEY.md §7.3). */
  def pricingSummary(li: DataFrame): DataFrame = {
    val disc  = money(lit(1)) - money(col("l_discount"))
    val chrg  = (money(col("l_extendedprice")) * disc).cast(Money) *
                (money(lit(1)) + money(col("l_tax")))
    ordered(li
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf(shipCut)))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(money(col("l_extendedprice")) * disc).cast("double").as("sum_disc_price"),
        sum(chrg).cast("double").as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order")))
  }

  private val pricingOracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin +
      orderByAll("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order")

  def oracle: Map[String, String] = Map(
    "q_agg_group_pricing" -> pricingOracle,
    // exact twin valid because vocab (31) « sketch counters (1024):
    // Misra-Gries never evicts ⇒ est = lb = ub = true count
    "q_agg_heavy_hitters" ->
      ("""SELECT t AS tok, COUNT(*) AS est, COUNT(*) AS lb, COUNT(*) AS ub
        |FROM (SELECT unnest(list_filter(string_split(text, ' '),
        |  x -> x <> '')) AS t FROM documents)
        |GROUP BY t""".stripMargin +
        orderByAll("tok", "est", "lb", "ub")),
    "q_agg_mode" ->
      ("""WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
        |  FROM lineitem GROUP BY l_returnflag, l_quantity)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS n_occurrences
        |FROM c
        |QUALIFY row_number() OVER (PARTITION BY l_returnflag
        |  ORDER BY cnt DESC, l_quantity ASC) = 1""".stripMargin +
        orderByAll("l_returnflag", "mode_qty", "n_occurrences")),
    "q_agg_bitmap_distinct" ->
      ("""SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin +
        orderByAll("event_type", "n_users", "n_events")),
    "q_agg_global" ->
      ("""SELECT COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
        |  MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
        |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_disc
        |FROM lineitem""".stripMargin +
        orderByAll("n_rows", "sum_qty", "avg_price", "min_ship", "max_ship", "sum_disc")),
    "q_agg_distinct" ->
      ("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
        |  COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin +
        orderByAll("l_returnflag", "n_supp", "n_part", "n_rows")),
    "q_agg_having" ->
      ("""SELECT c_mktsegment,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_bal,
        |  COUNT(*) AS n_cust
        |FROM customer GROUP BY c_mktsegment
        |HAVING CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(*) > 4000.0""".stripMargin +
        orderByAll("c_mktsegment", "avg_bal", "n_cust")),
    "q_agg_stats" ->
      ("""WITH sums AS (
        |  SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_extendedprice AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_discount AS DECIMAL(24,4)) * CAST(l_discount AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS syy,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(24,4)) * CAST(l_discount AS DECIMAL(14,4))) AS VARCHAR) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag,
        |  SQRT((sxx - sx * sx / n) / (n - 1.0)) AS sd_price,
        |  ((sxx - sx * sx / n) / (n - 1.0)) AS var_price,
        |  ((sxy - sx * sy / n) / (n - 1.0)) AS covar_pd,
        |  ((sxy - sx * sy / n) / (SQRT(sxx - sx * sx / n) * SQRT(syy - sy * sy / n))) AS corr_pd
        |FROM sums""".stripMargin +
        orderByAll("l_returnflag", "sd_price", "var_price", "covar_pd", "corr_pd")),
    "q_agg_histogram" ->
      ("""SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 11.0) AS INT) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY 1""".stripMargin +
        orderByAll("bucket", "n_orders", "sum_price", "min_price", "max_price")),
    "q_agg_percentile" ->
      ("""SELECT o_orderpriority,
        |  ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS median_price,
        |  ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_price,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin +
        orderByAll("o_orderpriority", "median_price", "p90_price", "n")),
    "q_agg_collect" ->
      ("""SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_custkey <= 50 GROUP BY o_custkey""".stripMargin +
        orderByAll("o_custkey", "orderkeys", "n_orders")),
    "q_agg_minmax_by" ->
      ("""SELECT user_id, event_id AS top_event_id, value AS top_value
        |FROM (SELECT user_id, event_id, value, row_number() OVER (
        |        PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin +
        orderByAll("user_id", "top_event_id", "top_value"))
  )
}
