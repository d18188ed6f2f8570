package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B-tier graph analytics (added r7) — link-analysis operators over a
  * co-purchase graph derived from the fixtures: parts are vertices,
  * and two parts are adjacent when some order contains both (the
  * item-to-item graph behind "customers also bought", and the same
  * shape as a doc-link graph in a crawl corpus, where PageRank-style
  * centrality is the classic document-quality prior for training-data
  * curation).
  *
  * Edge derivation is a self-join of lineitem on the order key: items
  * per order are bounded (≤7 in TPC-H-like data), so pair volume is
  * O(rows), never O(n²) — the join shuffles on l_orderkey once and
  * both sides reuse the same exchange. The edge table is memoized
  * (eager localCheckpoint keyed on exact leaf identity) because both
  * graph keys consume it and PageRank walks it once per iteration;
  * re-deriving it from the corpus each pass would re-scan the scan.
  *
  * Determinism: PageRank runs in fixed-point BIGINT (scale 1e9,
  * damping 85/100) with integer floor division only — Σ and argmax
  * order cannot perturb integers, so 6 unrolled iterations are
  * bit-identical in any engine. Triangle counting and clustering
  * coefficients are exact integers plus ONE final IEEE division.
  */
object Graph {

  private val edgeMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Directed co-purchase edges (both directions, distinct), memoized
    * per input identity. ~231k edges / 2000 vertices at sf0.01. */
  private[graft] def copurchaseEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    graft.plans.PlanKey.memoize(edgeMemo, li) {
      val a = li.select(col("l_orderkey"), col("l_partkey").as("src"))
      val b = li.select(col("l_orderkey"), col("l_partkey").as("dst"))
      a.join(b, Seq("l_orderkey")).filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst")).distinct()
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PageRank centrality over the co-purchase graph — the iterative
    // link-analysis primitive (document-quality priors, spam scoring,
    // influence ranking). 6 unrolled synchronous iterations, uniform
    // init rank = 1e9 per vertex, new = 0.15·1e9 + (85·Σ floor(r_u /
    // deg_u)) div 100 — all BIGINT, so cross-engine bit-exact.
    //
    // 100 TB posture: per iteration ONE shuffle of edge contributions
    // keyed on dst (map-side partial sums collapse each partition to
    // |V| rows) plus a node-sized left join — the standard synchronous
    // PageRank schedule (GraphX's Pregel does the same per superstep).
    // The edge+degree table is checkpointed once up front so the 6
    // passes walk a materialized table instead of re-running the
    // corpus self-join; rank state is |V| rows, never corpus-sized.
    // No global sort or window anywhere in the loop.
    "q_graph_pagerank" -> { (s, dir) =>
      val edges = copurchaseEdges(s, dir)
      // deg feeds every iteration (via ed) AND the final report join;
      // ed is walked once PER iteration — materialize both once so the
      // 6-pass loop never re-derives the degree aggregation or the
      // edge⋈degree join (r19; the triangles key's deg/oe rule). nodes
      // is deg's key set — no second distinct shuffle needed.
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .localCheckpoint()
      val nodes = deg.select(col("src").as("id"))
      val ed = edges.join(deg, Seq("src")).localCheckpoint()
      // rank state is |V| rows — size-gate a broadcast delivery (the
      // BFS/triangles rule: spark.graft.pagerank.broadcastNodes,
      // default 4M ≈ 64 MB of (id, rank) longs) so each pass is a
      // narrow broadcast-hash probe over the checkpointed ed plus ONE
      // |E|→|V| partial-agg shuffle, instead of re-shuffling the
      // |E|-row edge table every iteration (guide §3.1/§2.4). A graph
      // whose vertex set outgrows the gate drops the hints and runs
      // the co-partitioned schedule unchanged — identical integers
      // either way (BIGINT Σ is order-blind).
      val bcast = deg.count() <= s.conf
        .getOption("spark.graft.pagerank.broadcastNodes")
        .map(_.toLong).getOrElse(4000000L)
      def deliver(df: DataFrame): DataFrame =
        if (bcast) broadcast(df) else df
      var r = nodes.withColumn("r", lit(1000000000L))
      for (_ <- 1 to 6) {
        val contrib = ed.join(deliver(r), ed("src") === r("id"))
          .select(col("dst").as("id"), expr("r div d").as("c"))
          .groupBy(col("id")).agg(sum(col("c")).as("cs"))
        r = nodes.join(deliver(contrib), Seq("id"), "left")
          .select(col("id"),
            expr("CAST(150000000 + (85 * coalesce(cs, CAST(0 AS BIGINT))) div 100 AS BIGINT)").as("r"))
      }
      ordered(r.join(deg, r("id") === deg("src"))
        .select(col("id").as("p_partkey"), col("r").as("rank_q"),
          col("d").as("out_deg")))
    },

    // Single-source BFS hop distance — the traversal primitive next
    // to PageRank (centrality) and triangles (cohesion): reachability
    // radius from a seed vertex (min part key — deterministic), 6
    // frontier-expansion rounds; unreached vertices are dropped.
    // Integer hop counts — bit-exact anywhere.
    //
    // FRONTIER BFS, not full relaxation: with unit edge weights a
    // vertex's distance is FINAL the first round it is reached, so
    // each round only the just-settled layer joins the edge table
    // (dst ∉ settled via left-anti). A full-table min-relaxation
    // schedule (the pagerank superstep) re-walks ALL |E| edges every
    // round — measured 4.0× on a ×10 soak precisely because rounds
    // after saturation still paid |E|; this shape's per-round volume
    // is edges(frontier), which EMPTIES when the component is
    // exhausted. Each layer is eagerly localCheckpointed: the settled
    // set is referenced twice per round (union + anti-join), and an
    // unmaterialized layer would re-derive the whole prefix chain.
    //
    // 100 TB posture: frontier and settled sets are BROADCAST to the
    // edge scan (explicit hints — checkpointed layers carry no size
    // stats, so the planner would otherwise SMJ and re-shuffle all
    // |E| edges every round, measured as bad as full relaxation):
    // each round is a narrow pass over the checkpointed edge table
    // (broadcast semi on frontier + broadcast anti on settled) plus
    // ONE small shuffle to distinct the candidate layer — the edge
    // table never shuffles at all. Bounded-radius BFS layers are
    // |V|-bounded (broadcast-sized at any corpus the vertex set fits
    // a broadcast for); a graph whose layers outgrow broadcast would
    // drop the hints and co-partition edges by src instead. The
    // oracle replays the equivalent min-relaxation (identical result
    // for unit weights — first-touch distance IS the min).
    "q_graph_bfs" -> { (s, dir) => ordered(bfsHops(s, dir)) },

    // Label-propagation community detection (added r9) — the standard
    // semi-supervised clustering primitive for near-dup corpus
    // partitioning and link-farm grouping (Raghavan et al. 2007).
    // Deterministic SYNCHRONOUS variant: seed label(v)=v, then 3
    // rounds of label(v) := mode of neighbors' labels, ties broken by
    // the SMALLEST label — a total order, so the fixture converges
    // identically in any engine (all-integer state, no floats).
    //
    // 100 TB posture: per round TWO hash-agg shuffles keyed on vertex
    // id — count per (dst, label) with map-side partial aggregation,
    // then argmax per dst via max(struct(count, -label)) — and NO
    // window anywhere (a per-node rank window would sort; the struct
    // max is a pure hash agg). Label state is |V| rows; the memoized
    // edge table is walked once per round, never re-derived. The
    // oracle replays the same rounds with a ROW_NUMBER tie-break —
    // the identical total order, so results match bit-for-bit.
    "q_graph_label_prop" -> { (s, dir) =>
      val edges = copurchaseEdges(s, dir)
      var labels = edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint()
      // label state is |V| rows; size-gate a broadcast delivery so
      // each round probes the memoized edge table narrowly instead of
      // shuffling all |E| edges per round (guide §3.1 — checkpointed
      // label frames carry no size stats, so the planner would
      // otherwise SMJ; the BFS broadcast rule). The count is free:
      // labels is already materialized.
      val bcast = labels.count() <= s.conf
        .getOption("spark.graft.labelprop.broadcastNodes")
        .map(_.toLong).getOrElse(4000000L)
      for (_ <- 1 to 3) {
        labels = lpaRound(edges, labels, bcast).localCheckpoint()
      }
      ordered(labels.select(col("id").as("p_partkey"),
        col("label").as("community")))
    },

    // Degree-oriented triangle counting + local clustering coefficient
    // — the community-structure / cohesion primitive (spam-farm
    // detection, graph feature engineering). Every edge is oriented
    // from its lower-(degree, id) endpoint, so enumeration work is
    // bounded by Σ out-deg² with out-deg = O(√|E|) — the standard
    // distributed bound (cf. Suri & Vassilvitskii, WWW'11) — and each
    // triangle is found exactly once.
    //
    // r9 rework 2: adjacency-INTERSECTION accumulation — oriented
    // successor sets pack into |V| array rows (the whole adjacency is
    // |E| longs), each oriented edge picks up (N⁺(u), N⁺(v)), and
    // array_intersect finds each triangle's third vertex exactly once
    // (at the edge between its two orientation-smallest vertices).
    // The wedge table of the r7/r8 plan is never materialized or
    // shuffled — the same Σ out-deg² element bound now flows as packed
    // long arrays through codegen set-intersections instead of a
    // row-per-wedge shuffle + (v,w) closure join (A/B on this box:
    // wedge 276 s at the ×10 soak vs 159 s co-partitioned intersect;
    // at bench scale the wedge was ~3× slower than broadcast
    // intersect). The BFS broadcast-overflow rule picks HOW the
    // adjacency reaches the edges: |E| ≤ threshold (default 4M
    // entries ≈ 32 MB packed) → broadcast both probe joins (no
    // shuffle at all); larger → co-partitioned hash joins (the
    // forced-broadcast variant measured 260 s at ×10 — collecting a
    // multi-hundred-MB adjacency to the driver twice is the
    // anti-pattern the gate exists to avoid). Both paths emit the
    // same 3-rows-per-triangle multiset before the final hash agg
    // (GraphSpec pins equality); the gate reads ONE scalar off the
    // |V|-row degree table (the IVF-centroid metadata rule).
    //
    // 100 TB posture: equi-joins on vertex keys only — no cartesian,
    // no window (the orientation total order is a (degree, id) struct
    // comparison, never a row_number).
    "q_graph_triangles" -> { (s, dir) =>
      val (pernode, deg) = trianglesPerNode(s, dir)
      ordered(pernode.join(deg, Seq("id"))
        .select(col("id").as("p_partkey"), col("n_tri"), col("d").as("degree"),
          ((lit(2.0) * col("n_tri")) / (col("d") * (col("d") - 1))).as("clustering")))
    }
  )

  /** Per-node triangle participation counts (3 rows per triangle —
    * one per corner — pre-aggregated to (id, n_tri)) plus the degree
    * table. `forcePath` pins the adjacency-delivery strategy for
    * tests: Some(true) = broadcast probe joins, Some(false) =
    * co-partitioned hash joins, None = size-gated (broadcast iff
    * |E| ≤ spark.graft.triangles.broadcastEdges, default 4M entries
    * ≈ 32 MB of packed longs). */
  private[graft] def trianglesPerNode(s: SparkSession, dir: String,
      forcePath: Option[Boolean] = None): (DataFrame, DataFrame) = {
    val e = copurchaseEdges(s, dir)
    val ue = e.filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
    // deg feeds the orientation joins AND the final clustering join;
    // oe feeds multiple plan branches — without materialization each
    // branch re-runs the degree aggregation and both orientation
    // joins over the full edge table (measured: ~2.5× slower). Both
    // are at most |V| / |E| rows — cheap to pin, expensive to re-derive.
    val deg = ue.select(col("a").as("id")).union(ue.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d")).localCheckpoint()
    val oe = ue
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .localCheckpoint()
    val useBroadcast = forcePath.getOrElse {
      // |E| = Σd/2 off the checkpointed |V|-row degree table — a
      // metadata-grade scalar, same rule as the IVF centroid read
      val nEdges = deg.agg(sum(col("d"))).collect()(0).getLong(0) / 2
      nEdges <= s.conf.getOption("spark.graft.triangles.broadcastEdges")
        .map(_.toLong).getOrElse(4000000L)
    }
    val adj = oe.groupBy(col("u")).agg(collect_list(col("v")).as("nbrs"))
      .localCheckpoint()
    def deliver(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df
    val triples = oe.select(col("u"), col("v"))
      .join(deliver(adj), Seq("u"))
      .withColumnRenamed("nbrs", "nu")
      .join(deliver(adj.select(col("u").as("v"), col("nbrs").as("nv"))), Seq("v"))
      .select(col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("common"))
      .filter(size(col("common")) > 0)
      .select(explode(concat(col("common"),
        array_repeat(col("u"), size(col("common"))),
        array_repeat(col("v"), size(col("common"))))).as("id"))
    (triples.groupBy(col("id")).agg(count(lit(1)).as("n_tri")), deg)
  }

  /** One synchronous label-propagation round: label(v) := mode of
    * neighbors' labels, ties to the SMALLEST label. Two hash aggs —
    * count per (dst, label), then argmax per dst via
    * max(struct(count, -label)) — and deliberately NO per-node rank
    * window (a window would sort each vertex partition; the struct max
    * is a pure hash agg with map-side partials). PlanSpec pins the
    * window-free shape. */
  private[graft] def lpaRound(edges: DataFrame, labels: DataFrame,
      bcastLabels: Boolean = false): DataFrame =
    edges.join(if (bcastLabels) broadcast(labels) else labels,
        edges("src") === labels("id"))
      .groupBy(col("dst"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("dst"))
      .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
      .select(col("dst").as("id"), (-col("m.nl")).as("label"))

  /** Frontier BFS with a size-gated broadcast/co-partition switch
    * (r9 — implements the fallback the r8 Scaladoc only described).
    *
    * Fast path (layer ≤ `broadcastMaxLayer` rows): frontier and
    * settled sets BROADCAST to the edge scan — each round is a narrow
    * pass over the checkpointed edge table (broadcast semi + broadcast
    * anti) plus one small shuffle to distinct the candidate layer; the
    * edge table never shuffles.
    *
    * Fallback (a layer outgrows the broadcast budget): the edge table
    * is re-partitioned ON src ONCE (materialized on first use) and the
    * hints drop — the semi join then co-locates on the standing edge
    * partitioning, shuffling only the |layer|-sized frontier per
    * round, which is exactly the co-partitioned schedule a 100 TB
    * graph needs when layers are corpus-sized. The layer COUNT gates
    * the switch and is free: the layer is already materialized for
    * the exhaustion check. Both paths produce identical layers
    * (GraphSpec forces the threshold to 0 and asserts equality). */
  private[graft] def bfsHops(s: SparkSession, dir: String,
      broadcastMaxLayer: Long = 1000000L): DataFrame = {
    val edges = copurchaseEdges(s, dir)
    var coEdges: Option[DataFrame] = None
    var settled = edges.agg(min(col("src")).as("id"))
      .withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = settled.select(col("id"))
    var layerSize = 1L
    var r = 1
    var exhausted = false
    while (r <= 6 && !exhausted) {
      val expanded =
        if (layerSize <= broadcastMaxLayer)
          edges.join(broadcast(frontier), edges("src") === frontier("id"), "left_semi")
            .select(col("dst").as("id")).distinct()
            .join(broadcast(settled.select(col("id"))), Seq("id"), "left_anti")
        else {
          val ce = coEdges.getOrElse {
            val c = edges.repartition(col("src")).localCheckpoint()
            coEdges = Some(c); c
          }
          ce.join(frontier, ce("src") === frontier("id"), "left_semi")
            .select(col("dst").as("id")).distinct()
            .join(settled.select(col("id")), Seq("id"), "left_anti")
        }
      val next = expanded.withColumn("hops", lit(r.toLong)).localCheckpoint()
      // an empty layer means the component is exhausted — the
      // remaining rounds would scan |E| against nothing; the count is
      // free (the layer is already materialized) and cannot change
      // the result (every later layer would also be empty)
      val n = next.count()
      if (n == 0) exhausted = true
      else {
        settled = settled.union(next)
        frontier = next.select(col("id"))
        layerSize = n
      }
      r += 1
    }
    settled.select(col("id").as("p_partkey"), col("hops"))
  }

  private val edgesSql =
    """edges AS (
      |  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey)""".stripMargin

  /** 6 chained PageRank iteration CTEs — generated, mirroring the
    * unrolled Spark loop operation for operation (BIGINT `//`). */
  private def prIters(n: Int): String = (1 to n).map { i =>
    s"""r$i AS (
       |  SELECT n.id,
       |    CAST(150000000 + (85 * COALESCE(c.cs, 0)) // 100 AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst AS id, SUM(p.r // d.d) AS cs
       |    FROM edges e JOIN r${i - 1} p ON e.src = p.id
       |    JOIN deg d ON e.src = d.src
       |    GROUP BY e.dst) c ON n.id = c.id)""".stripMargin
  }.mkString(",\n")

  /** 6 chained BFS relaxation CTEs mirroring the unrolled Spark loop. */
  private def bfsIters(n: Int): String = (1 to n).map { i =>
    s"""d$i AS (
       |  SELECT p.id,
       |    LEAST(COALESCE(p.d, u.nd), COALESCE(u.nd, p.d)) AS d
       |  FROM d${i - 1} p LEFT JOIN (
       |    SELECT e.dst AS id, MIN(p2.d) + 1 AS nd
       |    FROM edges e JOIN d${i - 1} p2 ON e.src = p2.id
       |    WHERE p2.d IS NOT NULL GROUP BY e.dst) u ON p.id = u.id)""".stripMargin
  }.mkString(",\n")

  /** 3 chained label-propagation CTEs — mode of neighbor labels, ties
    * to the smallest label (ROW_NUMBER tie-break = the same total
    * order as the Spark side's max(struct(c, -label))). */
  private def lpaIters(n: Int): String = (1 to n).map { i =>
    s"""l$i AS (
       |  SELECT id, label FROM (
       |    SELECT e.dst AS id, p.label, COUNT(*) AS c,
       |      ROW_NUMBER() OVER (PARTITION BY e.dst
       |        ORDER BY COUNT(*) DESC, p.label ASC) AS rn
       |    FROM edges e JOIN l${i - 1} p ON e.src = p.id
       |    GROUP BY e.dst, p.label) t WHERE rn = 1)""".stripMargin
  }.mkString(",\n")

  def oracle: Map[String, String] = Map(
    "q_graph_label_prop" ->
      (s"""WITH $edgesSql,
        |l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
        |${lpaIters(3)}
        |SELECT id AS p_partkey, label AS community FROM l3""".stripMargin +
        orderByAll("p_partkey", "community")),
    "q_graph_bfs" ->
      (s"""WITH $edgesSql,
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |seed AS (SELECT MIN(src) AS s0 FROM edges),
        |d0 AS (SELECT id, CASE WHEN id = (SELECT s0 FROM seed)
        |  THEN CAST(0 AS BIGINT) ELSE CAST(NULL AS BIGINT) END AS d FROM nodes),
        |${bfsIters(6)}
        |SELECT id AS p_partkey, d AS hops FROM d6 WHERE d IS NOT NULL""".stripMargin +
        orderByAll("p_partkey", "hops")),
    "q_graph_pagerank" ->
      (s"""WITH $edgesSql,
        |deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |${prIters(6)}
        |SELECT r6.id AS p_partkey, r6.r AS rank_q, d.d AS out_deg
        |FROM r6 JOIN deg d ON r6.id = d.src""".stripMargin +
        orderByAll("p_partkey", "rank_q", "out_deg")),
    "q_graph_triangles" ->
      (s"""WITH $edgesSql,
        |ue AS (SELECT src AS a, dst AS b FROM edges WHERE src < dst),
        |deg AS (
        |  SELECT id, COUNT(*) AS d FROM (
        |    SELECT a AS id FROM ue UNION ALL SELECT b AS id FROM ue)
        |  GROUP BY id),
        |oe AS (
        |  SELECT CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.a ELSE ue.b END AS u,
        |         CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN ue.b ELSE ue.a END AS v,
        |         CASE WHEN (da.d, ue.a) < (db.d, ue.b) THEN db.d ELSE da.d END AS dv
        |  FROM ue JOIN deg da ON ue.a = da.id JOIN deg db ON ue.b = db.id),
        |tri AS (
        |  SELECT e1.u, e1.v AS v1, e2.v AS v2
        |  FROM oe e1 JOIN oe e2
        |    ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
        |  JOIN oe e3 ON e3.u = e1.v AND e3.v = e2.v),
        |pernode AS (
        |  SELECT id, COUNT(*) AS n_tri FROM (
        |    SELECT u AS id FROM tri UNION ALL SELECT v1 FROM tri
        |    UNION ALL SELECT v2 FROM tri)
        |  GROUP BY id)
        |SELECT p.id AS p_partkey, p.n_tri, d.d AS degree,
        |  2.0 * p.n_tri / (d.d * (d.d - 1)) AS clustering
        |FROM pernode p JOIN deg d ON p.id = d.id""".stripMargin +
        orderByAll("p_partkey", "n_tri", "degree", "clustering"))
  )
}
