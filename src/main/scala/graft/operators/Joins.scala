package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Det._
import graft.sources.Tables

/** B3 — joins (SURVEY.md §2).
  *
  * Scale notes per operator:
  *  - dims (region/nation, filtered part sets) are broadcast — no
  *    shuffle of the fact side;
  *  - fact⋈fact equi joins shuffle on the join key (sort-merge / AQE
  *    shuffled-hash) — correct partitioning at 1000 executors;
  *  - the theta join bounds BOTH sides with pushable filters before
  *    the nested-loop product, the only honest strategy for non-equi;
  *  - the as-of join is equi-join + per-key top-1 window; at 100 TB
  *    the window shuffles once on the same key as the join (single
  *    exchange, AQE-coalesced). */
object Joins {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      ordered(o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .select(col("o_orderkey"), col("c_custkey"), col("c_name"), col("o_totalprice")))
    },
    "q_join_null_safe" -> { (s, dir) =>
      // Null-safe equi join (added r9): `<=>` treats NULL = NULL as a
      // MATCH — the dimension-with-unknown-bucket join every warehouse
      // needs (unknown customers roll up to the unknown nation row
      // instead of silently dropping, the classic inner-join data-loss
      // bug). Nulls are planted deterministically on BOTH sides
      // (c_custkey%7, n_nationkey%5) so the null-match path provably
      // fires. EqualNullSafe is a hashable equi-key (null hashes like
      // any value), so the plan is a plain hash join — null-safety
      // costs nothing at scale, unlike the OR (a IS NULL AND b IS
      // NULL) rewrite, which breaks equi-key extraction.
      val c = Tables(s, dir, "customer")
        .withColumn("nk", when(col("c_custkey") % 7 === 0, lit(null))
          .otherwise(col("c_nationkey")).cast("int"))
      val n = Tables(s, dir, "nation")
        .withColumn("nk2", when(col("n_nationkey") % 5 === 0, lit(null))
          .otherwise(col("n_nationkey")).cast("int"))
      ordered(c.join(n, col("nk") <=> col("nk2"))
        .groupBy(col("nk").isNull.as("null_match"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_acctbal")))
    },
    "q_join_broadcast" -> { (s, dir) =>
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      ordered(n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name")))
    },
    "q_join_left" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice")))
    },
    "q_join_right" -> { (s, dir) =>
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
      val c = Tables(s, dir, "customer")
      ordered(o.join(c, o("o_custkey") === c("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice")))
    },
    "q_join_full" -> { (s, dir) =>
      val c = Tables(s, dir, "customer").filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
      val o = Tables(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      ordered(c.join(o, col("c_custkey") === col("o_custkey"), "full")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice")))
    },
    "q_join_semi" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")))
    },
    "q_join_anti" -> { (s, dir) =>
      // the orders side is RESTRICTED to o_custkey % 3 <> 0 (r16,
      // VERDICT item 5): the fixture gives every customer at least
      // one order, so the unrestricted anti join was vacuously empty.
      // With the restriction, every custkey % 3 == 0 customer loses
      // all their orders and lands in the result — non-empty at any
      // scale, and still the anti-join plan shape.
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders").filter(col("o_custkey") % 3 =!= 0)
      ordered(c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")))
    },
    "q_join_cross" -> { (s, dir) =>
      val r = Tables(s, dir, "region").select(col("r_name"))
      val n = Tables(s, dir, "nation").select(col("n_name"))
      ordered(r.crossJoin(n))
    },
    "q_join_theta_range" -> { (s, dir) =>
      // Non-equi join: bound both sides with pushable filters first,
      // then BroadcastNestedLoopJoin over the small part side.
      val p = Tables(s, dir, "part")
        .filter(col("p_size") <= 3).select(col("p_partkey"), col("p_retailprice"))
      val li = Tables(s, dir, "lineitem")
        .filter(col("l_quantity") <= 2.0).select(col("l_orderkey"), col("l_extendedprice"))
      ordered(li.join(broadcast(p),
          col("l_extendedprice") >= col("p_retailprice") * 10.0 &&
          col("l_extendedprice") <  col("p_retailprice") * 11.0)
        .groupBy(col("p_partkey"))
        .agg(count(lit(1)).as("n_li"), dsum(col("l_extendedprice")).as("sum_price")))
    },
    "q_join_asof" -> { (s, dir) =>
      // As-of: latest order (by o_orderdate, key-tiebreak) of the
      // event's user at event time, as a UNION-MERGE: tag both inputs,
      // sort once per user, carry the last order seen. The r1 equi-join
      // + per-event top-1 window materialized |events_u|×|orders_u|
      // rows per user before pruning — skew-amplified at 100 TB; this
      // formulation shuffles each input row exactly once (one exchange
      // on user_id) and its state per user is a single running struct.
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      // null literals take the ACTUAL input types (o_orderdate is
      // TIMESTAMP_NTZ in the fixture) so the output schema is
      // identical to the plain join formulation — a hardcoded
      // cast("timestamp") here would silently coerce NTZ → LTZ.
      val ordType = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderdate",
          o.schema("o_orderdate").dataType),
        org.apache.spark.sql.types.StructField("o_orderkey",
          o.schema("o_orderkey").dataType)))
      val merged = o.select(col("o_custkey").as("user_id"),
          col("o_orderdate").as("t"), lit(0).as("is_event"),
          lit(null).cast(e.schema("event_id").dataType).as("event_id"),
          lit(null).cast(e.schema("ts").dataType).as("ts"),
          struct(col("o_orderdate"), col("o_orderkey")).as("ord"))
        .unionByName(e.select(col("user_id"), col("ts").as("t"),
          lit(1).as("is_event"), col("event_id"), col("ts"),
          lit(null).cast(ordType).as("ord")))
      // order rows sort before event rows at equal t (<= asof bound);
      // among equal-date orders the LAST seen is the max o_orderkey,
      // matching the r1 top-1 tiebreak (o_orderdate DESC, o_orderkey
      // DESC). last(ignoreNulls) carries the running as-of order.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"), col("is_event"), col("ord.o_orderkey").asc_nulls_first,
          col("event_id").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ordered(merged
        .withColumn("asof", last(col("ord"), ignoreNulls = true).over(w))
        .filter(col("is_event") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof.o_orderkey").as("o_orderkey"),
          col("asof.o_orderdate").as("o_orderdate")))
    },
    "q_join_bucketed" -> { (s, dir) =>
      // Co-located join via bucketing — the 100 TB technique for
      // repeated fact⋈fact joins: both sides written bucketed+sorted
      // on the join key (once; amortized across every later join), so
      // the SortMergeJoin reads bucket-aligned files and needs NO
      // exchange on the join key (PlanSpec asserts). Output is
      // layout-independent ⇒ plain-SQL oracle.
      val (ot, ct) = ensureBucketed(s, dir)
      ordered(s.table(ot).join(s.table(ct),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("sum_price")))
    },
    "q_join_skew_salted" -> { (s, dir) =>
      // Skew-mitigation equi join — the write-path fix when one join
      // key is so hot that its rows exceed a single task (AQE's
      // skew-join split repairs READ skew after the shuffle files
      // exist; salting prevents the oversized partition from being
      // written at all). Probe side tags each row with a deterministic
      // salt in [0,S) derived from a non-key column; build side
      // replicates every row S times, one per salt value; joining on
      // (key, salt) spreads the hot key across S tasks. Output is
      // provably identical to the unsalted join — the oracle IS the
      // plain join. The merge hint keeps the demo honest at test SF
      // (broadcast would hide the salted exchange).
      // salt = hash of (key, linenumber) mod S: covers the full [0,S)
      // range (l_linenumber alone is 1..7 — it would leave salt 0
      // empty and waste 1/S of the replicated build side)
      val S = 8
      val li = Tables(s, dir, "lineitem")
        .withColumn("salt",
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(S)))
      val o = Tables(s, dir, "orders")
        .withColumn("salt", explode(sequence(lit(0), lit(S - 1))))
      ordered(li.join(o.hint("merge"),
          li("l_orderkey") === o("o_orderkey") && li("salt") === o("salt"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice")).as("sum_price")))
    },
    "q_join_interval_binned" -> { (s, dir) =>
      // Pure time-interval join (NO equi key) executed as a BINNED
      // equi join — the standard 100 TB range-join technique. The
      // naive plan for `e.ts ∈ [w.start, w.end)` is a nested-loop
      // product touching every (event, window) pair; binning time into
      // fixed buckets ≥ the window length turns it into an equi join
      // on bucket id with the range predicate as a residual filter.
      // Each 2h window overlaps ≤ 2 buckets (explode: ≤ 2× the tiny
      // window side), each event is in exactly 1, and a qualifying
      // pair meets in exactly one bucket — so no post-join dedup.
      // Shuffled volume O(|events| + 2·|windows|); PlanSpec asserts
      // the plan is BNLJ/cartesian-free. Windows are "incidents":
      // high-value events opening a [ts, ts+2h) watch window.
      val binSec = 7200L
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast("long").as("sec"), col("value"))
      val w = e.filter(col("value") > 300.0)
        .select(col("event_id").as("win_id"), col("sec").as("ws"),
          (col("sec") + lit(binSec)).as("we"))
      val wb = w.withColumn("bin",
        explode(sequence(expr(s"ws DIV $binSec"), expr(s"(we - 1) DIV $binSec"))))
      val eb = e.withColumn("bin", expr(s"sec DIV $binSec"))
      val j = eb.join(wb, eb("bin") === wb("bin") &&
        col("sec") >= col("ws") && col("sec") < col("we"))
      ordered(j.groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          dsum(col("value")).as("sum_value")))
    },
    "q_join_bloom_filtered" -> { (s, dir) =>
      // Runtime bloom-filter join — Catalyst's InjectRuntimeFilter:
      // a selective filter on the build side (urgent cheap orders,
      // ~2% of rows) is turned into a bloom filter aggregated from the
      // build side and applied at the PROBE side's scan, so ~98% of
      // lineitem rows die before the shuffle instead of after it. At
      // 100 TB this is the dominant shuffle reducer for selective
      // fact⋈fact joins (semi-join pushdown/sideways information
      // passing in the literature). Locally the thresholds assume
      // multi-GB inputs, so scope them down (and disable broadcast —
      // at real scale both sides shuffle) for the duration of
      // PLANNING only; the plan is forced while the confs hold, and
      // the bloom filter is semantics-preserving so the output is
      // byte-identical either way. PlanSpec asserts might_contain sits
      // on the probe-side scan.
      graft.Confs.withConfs(s,
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val o = Tables(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") < 30000.0)
          .select(col("o_orderkey"))
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"))
        val out = ordered(li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_items"),
            dsum(col("l_extendedprice")).as("sum_price")))
        out.queryExecution.executedPlan // force planning under the scoped confs
        out
      }
    },
    "q_merge_upsert" -> { (s, dir) =>
      // MERGE INTO (SCD-1 upsert) — the lakehouse write primitive
      // (Delta/Iceberg MERGE), expressed as its underlying plan: a
      // full-outer key join where the source wins on match (update),
      // source-only rows insert, target-only rows carry over. The
      // source is manufactured deterministically from the target
      // (every key ≡3 mod 10 gets a 5% price bump; every key ≡7 mod
      // 100 re-keys past max(o_orderkey) as an insert) so both MERGE
      // arms provably fire. Report = per-status row/update/insert
      // counts + exact decimal price sum. 100 TB posture: MERGE cost
      // IS this shuffle — with the target bucketed by key only the
      // (much smaller) source side shuffles, and AQE handles source
      // skew; s_foreachbatch_upsert is the streaming/incremental twin
      // of the same shape.
      val t = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val mx = t.agg(max(col("o_orderkey")).as("mx"))
      val updates = t.filter(col("o_orderkey") % 10 === 3)
        .withColumn("o_totalprice", col("o_totalprice") * lit(1.05))
      val inserts = t.filter(col("o_orderkey") % 100 === 7)
        .crossJoin(broadcast(mx))
        .select((col("o_orderkey") + col("mx")).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice"))
      val src = updates.unionByName(inserts)
      val merged = t.as("t")
        .join(src.as("s"), col("t.o_orderkey") === col("s.o_orderkey"),
          "full_outer")
        .select(
          coalesce(col("s.o_orderstatus"), col("t.o_orderstatus")).as("st"),
          coalesce(col("s.o_totalprice"), col("t.o_totalprice")).as("price"),
          when(col("s.o_orderkey").isNotNull && col("t.o_orderkey").isNotNull,
            1L).otherwise(0L).as("updated"),
          when(col("t.o_orderkey").isNull, 1L).otherwise(0L).as("inserted"))
      ordered(merged.groupBy(col("st"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("updated")).cast("long").as("n_updated"),
          sum(col("inserted")).cast("long").as("n_inserted"),
          dsum(col("price")).as("sum_price")))
    },
    "q_merge_scd2" -> { (s, dir) =>
      // SCD type-2 dimension build from a changelog (added r7) — the
      // versioned-history twin of q_merge_upsert's SCD-1 overwrite:
      // each customer's order stream is read as an attribute-change
      // feed (tracked attribute = order priority), consecutive equal
      // values collapse into one validity run, and each run gets
      // [valid_from, valid_to) + is_current + version — the standard
      // lakehouse dimension-history shape (Kimball SCD2), entirely as
      // two window passes over the SAME (custkey | ts, seq) layout so
      // Catalyst plans ONE shuffle-sort and both windows ride it.
      // Ties inside a day are broken by the change-feed sequence key
      // (o_orderkey), so the history is deterministic both engines.
      // 100 TB posture: state per key is its change rows, partitioned
      // by custkey — no global sort; a nightly incremental variant
      // would window only (open tail ∪ new changes) per key, same plan.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("custkey")).orderBy(col("ts"), col("seq"))
      val chg = Tables(s, dir, "orders").select(
          col("o_custkey").as("custkey"), col("o_orderdate").as("ts"),
          col("o_orderkey").as("seq"), col("o_orderpriority").as("val"))
        .withColumn("prev", lag(col("val"), 1).over(w))
      val runs = chg.filter(col("prev").isNull || col("val") =!= col("prev"))
      val scd = runs
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .withColumn("version", row_number().over(w))
      ordered(scd.select(col("custkey"), col("val").as("priority"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"), col("version").cast("long")))
    },
    "q_join_asof_tolerance" -> { (s, dir) =>
      // As-of with TOLERANCE and direction="nearest" (the pandas
      // merge_asof surface q_join_asof's backward-only rule lacks):
      // each event matches the nearest order activity of its user
      // within ±12 h, preferring backward on equal gaps; events with
      // nothing in tolerance drop out. Order activity times are
      // MANUFACTURED into the events' epoch window (deterministic
      // o_orderkey arithmetic — the fixture's 1992-98 order dates are
      // decades from the 2024 events, which would make every
      // tolerance check vacuous), and all time math stays in exact
      // epoch-second BIGINTs. Same UNION-MERGE shape as q_join_asof —
      // one exchange on user_id, TWO frames over the SAME sort (the
      // running last(ignoreNulls) carries the backward candidate, the
      // mirrored first(ignoreNulls) over the following frame carries
      // the forward one), so Catalyst plans a single shuffle-sort and
      // both windows ride it. Equal-t orders sort BEFORE the event
      // (≤ bound ⇒ backward, gap 0) and are correctly excluded from
      // the forward frame. Key tiebreaks mirror q_join_asof: backward
      // takes the max o_orderkey of an equal time, forward the min.
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          expr("CAST(ts AS LONG)").as("es"))
      val o = Tables(s, dir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderkey"),
          (lit(1704067200L) + (col("o_orderkey") * 7919L) % 2592000L)
            .as("ord_sec"))
      val merged = o.select(col("user_id"), col("ord_sec").as("t"),
          lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
          struct(col("ord_sec"), col("o_orderkey")).as("ord"))
        .unionByName(e.select(col("user_id"), col("es").as("t"),
          lit(1).as("is_event"), col("event_id"),
          lit(null).cast("struct<ord_sec:bigint,o_orderkey:bigint>").as("ord")))
      val sortCols = Seq(col("t"), col("is_event"),
        col("ord.o_orderkey").asc_nulls_first, col("event_id").asc_nulls_first)
      val wPrev = Window.partitionBy(col("user_id")).orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(sortCols: _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val tol = 43200L
      val cand = merged
        .withColumn("pv", last(col("ord"), ignoreNulls = true).over(wPrev))
        .withColumn("nx", first(col("ord"), ignoreNulls = true).over(wNext))
        .filter(col("is_event") === 1)
        .withColumn("gp", col("t") - col("pv.ord_sec"))
        .withColumn("gn", col("nx.ord_sec") - col("t"))
      val takeBwd = col("pv").isNotNull && col("gp") <= tol &&
        (col("nx").isNull || col("gn") > tol || col("gp") <= col("gn"))
      val takeFwd = col("nx").isNotNull && col("gn") <= tol
      ordered(cand
        .withColumn("direction",
          when(takeBwd, "backward").when(takeFwd, "forward"))
        .filter(col("direction").isNotNull)
        .select(col("event_id"), col("user_id"), col("t").as("event_sec"),
          when(col("direction") === "backward", col("pv.o_orderkey"))
            .otherwise(col("nx.o_orderkey")).as("o_orderkey"),
          when(col("direction") === "backward", col("pv.ord_sec"))
            .otherwise(col("nx.ord_sec")).as("ord_sec"),
          col("direction"),
          when(col("direction") === "backward", col("gp"))
            .otherwise(col("gn")).as("gap_s")))
    },
    "q_merge_cdc" -> { (s, dir) =>
      // CDC changelog apply — the third lakehouse merge shape next to
      // q_merge_upsert (SCD-1 overwrite) and q_merge_scd2 (versioned
      // history): a Debezium-style I/U/D operation feed is compacted
      // to the CURRENT table state by latest-version-wins, with
      // deletes tombstoning the key entirely. The feed is manufactured
      // deterministically from orders (insert for every key, a priced
      // update for keys ≡0 mod 7, a delete for keys ≡0 mod 13), so
      // all three op paths and their override chains (I→U, I→D, I→U→D)
      // provably fire. Apply = ONE row_number window per key ordered
      // by version DESC, keep rn=1 where op≠'D' — the standard
      // compaction query every CDC sink runs.
      // 100 TB posture: the window partitions by the merge key — no
      // global sort, state per key = its change rows; an incremental
      // run windows only (current row ∪ new changes) per key, the
      // identical plan. Union of three projections of ONE scan —
      // Catalyst collapses to a single pass over orders.
      val o = Tables(s, dir, "orders")
      val ins = o.select(col("o_orderkey").as("k"), lit(1L).as("version"),
        lit("I").as("op"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").as("k"), lit(2L).as("version"),
          lit("U").as("op"), (col("o_totalprice") * lit(1.1)).as("price"),
          lit("P").as("status"))
      val del = o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey").as("k"), lit(3L).as("version"),
          lit("D").as("op"), lit(null).cast("double").as("price"),
          lit(null).cast("string").as("status"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("version").desc)
      val latest = ins.union(upd).union(del)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "D")
      ordered(latest.select(col("k").as("o_orderkey"), col("status"),
        col("price"), col("version")))
    },
    "q_join_fuzzy" -> { (s, dir) =>
      val names = Tables(s, dir, "part")
        .groupBy(col("p_name").as("name")).agg(count(lit(1)).as("cnt"))
      ordered(fuzzyPairs(names))
    },
    "q_join_multiway" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") <  lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      ordered(li
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(money(col("l_extendedprice")) * (money(lit(1)) - money(col("l_discount"))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_li")))
    }
  )

  /** Write orders/customer as bucketed+sorted tables (8 buckets on the
    * join key) once per JVM per sfDir; returns the table names. */
  private def ensureBucketed(s: SparkSession, dir: String): (String, String) = {
    val tag = math.abs(dir.hashCode).toString
    val ot = s"graft_bk_orders_$tag"; val ct = s"graft_bk_customer_$tag"
    if (!s.catalog.tableExists(ot)) {
      // the metastore (derby) is per-JVM but the warehouse DIR
      // persists across runs — clear leftover locations or
      // saveAsTable fails with LOCATION_ALREADY_EXISTS
      for (t <- Seq(ot, ct)) {
        val loc = new java.io.File(
          new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath, t)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
      }
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ot)
      Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(ct)
    }
    (ot, ct)
  }

  /** Exact edit-distance (Levenshtein ≤ 2) self-join over a distinct
    * (name, cnt) table, PassJoin-shaped (Li et al., VLDB'11 — same
    * family as the PPJoin prefix filter used by q_dedup_near_jaccard):
    *
    *  1. the caller dedupes the corpus to DISTINCT strings +
    *     multiplicity first — at 100 TB the distinct-value table is
    *     orders of magnitude smaller than the corpus, and the final
    *     multiplicity product restores pair counts without ever
    *     joining raw rows;
    *  2. pigeonhole candidates: split each indexed name into k+1
    *     contiguous segments; any string within k edits must contain
    *     one segment VERBATIM at a position shifted by at most k, so
    *     the probe side emits (target-length, segment, substring-
    *     window) keys and candidates come from an EQUI-join on
    *     (len, seg, sub) — shuffle volume is O(names × (2k+1)²(k+1))
    *     keys, never the O(n²) cross product (nested-loop-free plan
    *     asserted in PlanSpec; equality with brute force property-
    *     tested at k = 1, 2, 3 over generated strings in
    *     PropertyProps);
    *  3. exact levenshtein() filter on the candidate superset.
    *
    * Input: columns (name STRING non-null, cnt BIGINT), names
    * distinct. Output: (na, nb, dist, n_pairs) with na < nb and
    * dist ≤ k. */
  private[graft] def fuzzyPairs(names: DataFrame, k: Int = 2): DataFrame = {
    require(k >= 1, s"edit-distance threshold must be >= 1, got $k")
    val nseg = k + 1
    val L = length(col("name"))
    // balanced segment bounds for a length-l string: segment i of k+1
    // starts at floor(l*i/(k+1))+1 (1-based), spans to the next bound.
    val indexed = names.select(col("name").as("na"), col("cnt").as("cnt_a"),
        L.as("la"),
        explode(expr(
          s"""transform(sequence(0, $k), i -> struct(
            |  i AS segi,
            |  substring(name, CAST(length(name)*i DIV $nseg AS INT) + 1,
            |    CAST(length(name)*(i+1) DIV $nseg AS INT)
            |      - CAST(length(name)*i DIV $nseg AS INT)) AS sub))""".stripMargin))
          .as("seg"))
      .select(col("na"), col("cnt_a"), col("la"),
        col("seg.segi").as("segi"), col("seg.sub").as("sub"))
    val probes = names.select(col("name").as("nb"), col("cnt").as("cnt_b"),
        explode(expr(
          s"""flatten(flatten(transform(sequence(length(name)-$k, length(name)+$k), l ->
            |  transform(sequence(0, $k), i ->
            |    filter(transform(sequence(CAST(l*i DIV $nseg AS INT) + 1 - $k,
            |                              CAST(l*i DIV $nseg AS INT) + 1 + $k), pos ->
            |      struct(l AS la, i AS segi, pos AS pos,
            |        CAST(l*(i+1) DIV $nseg AS INT) - CAST(l*i DIV $nseg AS INT) AS sl)),
            |      c -> c.pos >= 1 AND c.pos + c.sl - 1 <= length(name) AND c.sl > 0)
            |  ))))""".stripMargin)).as("k"))
      .select(col("nb"), col("cnt_b"), col("k.la").cast("int").as("la"),
        col("k.segi").as("segi"),
        expr("substring(nb, k.pos, k.sl)").as("sub"))
    // strings shorter than k+1 chars cannot form k+1 non-empty
    // segments, so the pigeonhole misses pairs where BOTH sides are
    // that short (k=2: "ab" ↔ "cd" — every non-empty segment is
    // edited, only the dropped empty segment is clean). Pair the tiny
    // strings through a constant-key bucket: distinct strings of
    // length ≤ k are a constant-bounded set in any corpus
    // (≤ Σ|alphabet|^i, i ≤ k), and the constant key keeps it a
    // broadcast HASH join, never a nested loop. Pairs with one short
    // and one ≥k+1-char side are already exact via the main path (the
    // long side indexes, the short side probes).
    val tiny = names.filter(length(col("name")) <= k)
    // the bucket key must DERIVE from a column: a bare lit(1) on both
    // sides constant-folds out of the join condition and the planner
    // degrades to a nested loop. pmod(length, 1) ≡ 0 but no current
    // optimizer rule folds it; if one ever does, PlanSpec's
    // no-nested-loop assertion for q_join_fuzzy catches the downgrade.
    val tinyKey = pmod(length(col("name")), lit(1))
    val tinyCand = tiny
      .select(col("name").as("na"), col("cnt").as("cnt_a"), tinyKey.as("tk"))
      .join(tiny.select(col("name").as("nb"), col("cnt").as("cnt_b"),
        tinyKey.as("tk")), "tk")
      .filter(col("na") < col("nb"))
      .select(col("na"), col("nb"), col("cnt_a"), col("cnt_b"))
    val cand = indexed.join(probes, Seq("la", "segi", "sub"))
      .filter(col("na") < col("nb"))
      .select(col("na"), col("nb"), col("cnt_a"), col("cnt_b"))
      .union(tinyCand).distinct()
    cand
      .withColumn("dist", levenshtein(col("na"), col("nb")))
      .filter(col("dist") <= k)
      .select(col("na"), col("nb"), col("dist"),
        (col("cnt_a") * col("cnt_b")).as("n_pairs"))
  }

  def oracle: Map[String, String] = Map(
    "q_join_bucketed" ->
      ("""SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin +
        orderByAll("c_mktsegment", "n_orders", "sum_price")),
    "q_join_inner" ->
      ("""SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey""".stripMargin +
        orderByAll("o_orderkey", "c_custkey", "c_name", "o_totalprice")),
    "q_join_null_safe" ->
      ("""WITH c AS (
        |  SELECT c_acctbal,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk
        |  FROM customer),
        |n AS (
        |  SELECT n_name,
        |    CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS nk2
        |  FROM nation)
        |SELECT nk IS NULL AS null_match, n_name, COUNT(*) AS n_cust,
        |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS sum_acctbal
        |FROM c JOIN n ON nk IS NOT DISTINCT FROM nk2
        |GROUP BY nk IS NULL, n_name""".stripMargin +
        orderByAll("null_match", "n_name", "n_cust", "sum_acctbal")),
    "q_join_skew_salted" ->
      ("""SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin +
        orderByAll("o_orderpriority", "n_items", "sum_price")),
    "q_join_broadcast" ->
      ("""SELECT n_nationkey, n_name, r_name
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin +
        orderByAll("n_nationkey", "n_name", "r_name")),
    "q_join_left" ->
      ("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |ON c_custkey = o.o_custkey""".stripMargin +
        orderByAll("c_custkey", "c_name", "o_orderkey", "o_totalprice")),
    "q_join_right" ->
      ("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 300000.0) o
        |RIGHT JOIN customer ON o.o_custkey = c_custkey""".stripMargin +
        orderByAll("c_custkey", "c_name", "o_orderkey", "o_totalprice")),
    "q_join_full" ->
      ("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
        |FULL JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |           WHERE o_totalprice > 300000.0) o
        |ON c.c_custkey = o.o_custkey""".stripMargin +
        orderByAll("c_custkey", "c_name", "o_orderkey", "o_totalprice")),
    "q_join_semi" ->
      ("""SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin +
        orderByAll("c_custkey", "c_name")),
    "q_join_anti" ->
      ("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_custkey % 3 <> 0)""".stripMargin +
        orderByAll("c_custkey", "c_name", "c_mktsegment")),
    "q_join_cross" ->
      ("SELECT r_name, n_name FROM region CROSS JOIN nation" +
        orderByAll("r_name", "n_name")),
    "q_join_theta_range" ->
      ("""SELECT p_partkey, COUNT(*) AS n_li,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM (SELECT p_partkey, p_retailprice FROM part WHERE p_size <= 3) p
        |JOIN (SELECT l_orderkey, l_extendedprice FROM lineitem WHERE l_quantity <= 2.0) l
        |  ON l.l_extendedprice >= p.p_retailprice * 10.0
        | AND l.l_extendedprice <  p.p_retailprice * 11.0
        |GROUP BY p_partkey""".stripMargin +
        orderByAll("p_partkey", "n_li", "sum_price")),
    "q_join_asof" ->
      ("""SELECT event_id, user_id, ts, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
        |    row_number() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC NULLS LAST, o.o_orderkey DESC NULLS LAST) AS rn
        |  FROM events e LEFT JOIN orders o
        |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        |WHERE rn = 1""".stripMargin +
        orderByAll("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")),
    "q_join_interval_binned" ->
      // brute-force interval-join twin: DuckDB plans this as an
      // IEJoin; the engine side must produce identical rows from the
      // binned formulation
      ("""WITH e AS (SELECT event_id, user_id, epoch_us(ts)//1000000 AS sec, value
        |           FROM events),
        |w AS (SELECT event_id AS win_id, sec AS ws, sec + 7200 AS we
        |      FROM e WHERE value > 300.0),
        |j AS (SELECT w.win_id, e.user_id, e.value
        |      FROM w JOIN e ON e.sec >= w.ws AND e.sec < w.we)
        |SELECT win_id, COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM j GROUP BY win_id""".stripMargin +
        orderByAll("win_id", "n_events", "n_users", "sum_value")),
    "q_join_bloom_filtered" ->
      ("""SELECT o.o_orderkey, COUNT(*) AS n_items,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_price
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice < 30000.0
        |GROUP BY o.o_orderkey""".stripMargin +
        orderByAll("o_orderkey", "n_items", "sum_price")),
    "q_merge_upsert" ->
      ("""WITH t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |mx AS (SELECT MAX(o_orderkey) AS mx FROM t),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice * 1.05 AS o_totalprice
        |  FROM t WHERE o_orderkey % 10 = 3),
        |ins AS (
        |  SELECT t.o_orderkey + mx.mx AS o_orderkey, t.o_orderstatus,
        |    t.o_totalprice
        |  FROM t, mx WHERE t.o_orderkey % 100 = 7),
        |src AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |m AS (
        |  SELECT COALESCE(s.o_orderstatus, t.o_orderstatus) AS st,
        |    COALESCE(s.o_totalprice, t.o_totalprice) AS price,
        |    CASE WHEN s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
        |      THEN 1 ELSE 0 END AS updated,
        |    CASE WHEN t.o_orderkey IS NULL THEN 1 ELSE 0 END AS inserted
        |  FROM t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey)
        |SELECT st, COUNT(*) AS n_rows,
        |  CAST(SUM(updated) AS BIGINT) AS n_updated,
        |  CAST(SUM(inserted) AS BIGINT) AS n_inserted,
        |  CAST(CAST(SUM(CAST(price AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        |    AS sum_price
        |FROM m GROUP BY st""".stripMargin +
        orderByAll("st", "n_rows", "n_updated", "n_inserted", "sum_price")),
    "q_join_asof_tolerance" ->
      // brute-force nearest-within-tolerance twin: candidate set =
      // every order of the user within ±12 h, rank by (gap, backward
      // preference, the direction-appropriate key tiebreak)
      ("""WITH os AS (
        |  SELECT o_custkey AS user_id, o_orderkey,
        |    1704067200 + (o_orderkey * 7919) % 2592000 AS ord_sec
        |  FROM orders),
        |c AS (
        |  SELECT e.event_id, e.user_id,
        |    epoch_us(e.ts)//1000000 AS event_sec, o.o_orderkey, o.ord_sec,
        |    (o.ord_sec <= epoch_us(e.ts)//1000000) AS bwd,
        |    CASE WHEN o.ord_sec <= epoch_us(e.ts)//1000000
        |      THEN epoch_us(e.ts)//1000000 - o.ord_sec
        |      ELSE o.ord_sec - epoch_us(e.ts)//1000000
        |    END AS gap_s
        |  FROM events e JOIN os o ON o.user_id = e.user_id),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |    ORDER BY gap_s ASC, bwd DESC,
        |      CASE WHEN bwd THEN -o_orderkey ELSE o_orderkey END ASC) AS rn
        |  FROM c WHERE gap_s <= 43200)
        |SELECT event_id, user_id, CAST(event_sec AS BIGINT) AS event_sec,
        |  o_orderkey, CAST(ord_sec AS BIGINT) AS ord_sec,
        |  CASE WHEN bwd THEN 'backward' ELSE 'forward' END AS direction,
        |  CAST(gap_s AS BIGINT) AS gap_s
        |FROM r WHERE rn = 1""".stripMargin +
        orderByAll("event_id", "user_id", "event_sec", "o_orderkey", "ord_sec",
          "direction", "gap_s")),
    "q_merge_cdc" ->
      ("""WITH feed AS (
        |  SELECT o_orderkey AS k, CAST(1 AS BIGINT) AS version, 'I' AS op,
        |    o_totalprice AS price, o_orderstatus AS status FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 2, 'U', o_totalprice * 1.1, 'P'
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 3, 'D', CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |latest AS (
        |  SELECT k, version, op, price, status,
        |    row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        |  FROM feed)
        |SELECT k AS o_orderkey, status, price, version
        |FROM latest WHERE rn = 1 AND op <> 'D'""".stripMargin +
        orderByAll("o_orderkey", "status", "price", "version")),
    "q_merge_scd2" ->
      ("""WITH chg AS (
        |  SELECT o_custkey AS custkey, o_orderdate AS ts, o_orderkey AS seq,
        |    o_orderpriority AS val,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |runs AS (
        |  SELECT custkey, ts, seq, val FROM chg
        |  WHERE prev IS NULL OR val <> prev),
        |scd AS (
        |  SELECT custkey, val, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY custkey ORDER BY ts, seq) AS valid_to,
        |    row_number() OVER (PARTITION BY custkey ORDER BY ts, seq) AS version
        |  FROM runs)
        |SELECT custkey, val AS priority, valid_from, valid_to,
        |  (valid_to IS NULL) AS is_current, CAST(version AS BIGINT) AS version
        |FROM scd""".stripMargin +
        orderByAll("custkey", "priority", "valid_from", "valid_to",
          "is_current", "version")),
    "q_join_fuzzy" ->
      ("""WITH n AS (SELECT p_name AS name, COUNT(*) AS cnt
        |           FROM part GROUP BY p_name)
        |SELECT a.name AS na, b.name AS nb,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist,
        |  a.cnt * b.cnt AS n_pairs
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 2""".stripMargin +
        orderByAll("na", "nb", "dist", "n_pairs")),
    "q_join_multiway" ->
      ("""SELECT r_name, n_name,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_li
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY r_name, n_name""".stripMargin +
        orderByAll("r_name", "n_name", "revenue", "n_li"))
  )
}
