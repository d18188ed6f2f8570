package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B10 (vector aggregation) — per-label embedding centroids, the
  * pooling step behind classifier prototypes, IVF coarse quantizers,
  * and per-source embedding drift monitoring in a training-data
  * pipeline.
  *
  * Determinism at scale: a distributed SUM over doubles is partition-
  * order-dependent (fp addition is non-associative), so the centroid
  * aggregation quantizes each component to a 1e-7 fixed-point BIGINT
  * first (floor(x·1e7) — float components carry ~7 significant digits,
  * so the quantization is below input precision) and sums exact
  * integers: order-independent, overflow-safe (|x| ≤ 1 ⇒ |sum| ≤ 1e7·n),
  * and bit-identical in any engine. The same trick is how the oracle
  * stays exact.
  *
  * 100 TB posture: posexplode → hash agg on (label, dim) — map-side
  * partials collapse each partition to |labels|·dim rows, so the
  * shuffle is centroid-sized, not data-sized. Output is (label, dim)
  * rows, not arrays — array re-assembly is a presentation step
  * (`transform(array_sort(collect_list(...)))`) left to callers.
  */
object Embeddings {

  /** Shared product-quantization trainer (q_embed_pq + the ADC recall
    * spec): 64 dims split into 16 subspaces of 4, per-subspace Lloyd
    * with k=16 codes — init = subvectors of the 16 lowest vec_ids,
    * one recompute pass, final assignment. Returns (assignments =
    * (vec_id, sp, cid, dist_q), codebook = (sp, cid, cv)). All sixteen
    * subspaces train in the SAME two shuffles per pass: the subvector
    * relation carries sp as a key, centroids pack per-sp into a
    * broadcast row, and the recompute agg keys on (sp, cid, dim) —
    * k·sp more centroid rows, zero extra corpus passes vs plain
    * k-means. Same fixed-point determinism contract as q_embed_kmeans
    * (l2_dist_q + 1e-7 centroid quantization). */
  private[graft] def pqTrain(e: DataFrame): (DataFrame, DataFrame) = {
    val sub = e.select(col("vec_id"), posexplode(
      expr("transform(sequence(0, 15), sp -> slice(v, sp * 4 + 1, 4))"))
      .as(Seq("sp", "sv")))
    val init = sub.filter(col("vec_id") < 16)
      .select(col("sp"), col("vec_id").cast("int").as("cid"), col("sv").as("cv"))
    def assign(cents: DataFrame): DataFrame = {
      val packed = cents.groupBy(col("sp"))
        .agg(expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      sub.join(broadcast(packed), Seq("sp"))
        .withColumn("best", expr(
          "array_min(transform(cs, c -> named_struct(" +
            "'dq', l2_dist_q(sv, c.cv), 'cid', c.cid)))"))
        .select(col("vec_id"), col("sp"), col("sv"),
          col("best.cid").as("cid"), col("best.dq").as("dist_q"))
    }
    def recompute(asg: DataFrame): DataFrame =
      asg.select(col("sp"), col("cid"), posexplode(col("sv")).as(Seq("dim", "x")))
        .withColumn("xq", floor(col("x") * lit(1e7)).cast("long"))
        .groupBy(col("sp"), col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("sq"))
        .withColumn("c", col("sq").cast("double") / lit(1e7) / col("n"))
        .groupBy(col("sp"), col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, c))), p -> p.c)")
          .as("cv"))
    val c1 = recompute(assign(init))
    (assign(c1), c1)
  }

  /** Shared two-iteration Lloyd k-means (k=8) over the embeddings
    * fixture — q_embed_kmeans's trainer, factored so q_dedup_semdedup
    * clusters with the IDENTICAL assignment (and the identical DuckDB
    * oracle CTE chain). Deterministic everywhere: init = the k lowest
    * vec_ids; distances are the codegen l2_dist_q expression
    * (fixed-point Σ floor((x−y)²·1e12) — exact integers, so argmin
    * order is engine- and partition-order-independent); centroid means
    * go through the same 1e-7 fixed-point trick as q_embed_centroid.
    * Returns (a2 = final assignment (vec_id, v, cid, dist_q), c1 =
    * the centroids it was assigned against). */
  private[graft] def kmeans2(e: DataFrame): (DataFrame, DataFrame) = {
    def assign(cents: DataFrame): DataFrame = {
      val packed = cents.agg(
        expr("array_sort(collect_list(struct(cid, cv)))").as("cs"))
      e.crossJoin(broadcast(packed))
        .withColumn("best", expr(
          "array_min(transform(cs, c -> named_struct(" +
            "'dq', l2_dist_q(v, c.cv), 'cid', c.cid)))"))
        .select(col("vec_id"), col("v"),
          col("best.cid").as("cid"), col("best.dq").as("dist_q"))
    }
    def recompute(asg: DataFrame): DataFrame =
      asg.select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .withColumn("xq", floor(col("x") * lit(1e7)).cast("long"))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("sq"))
        .withColumn("c", col("sq").cast("double") / lit(1e7) / col("n"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(dim, c))), p -> p.c)")
          .as("cv"))
    val init = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("v").as("cv"))
    val c1 = recompute(assign(init))
    (assign(c1), c1)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_pca" -> { (s, dir) =>
      // Top principal component by POWER ITERATION (added r8) — the
      // classic dimensionality diagnostic missing between centroid
      // (mean), kmeans (clusters), rproj (random shrink) and pq
      // (quantization): 4 unrolled covariance-free iterations
      // w = Σ_x (x−μ)·((x−μ)·v), v' = w/‖w‖, from the exactly
      // representable v₀ = 1/8 constant vector. Cross-engine exact:
      // μ via the house 1e-7 fixed point; each row's dot is a
      // left-assoc codegen fold (deterministic per row); per-row
      // per-dim contributions quantize ONCE (floor·1e6) so the
      // across-row sums are BIGINTs no order can perturb; ‖w‖ and the
      // normalization are single shared IEEE expressions on identical
      // integers. Sign is pinned by the all-positive init.
      // 100 TB posture: each iteration is ONE corpus pass (narrow dot
      // + explode → 64-row hash agg with map-side partials); μ and v
      // ride as 1-row broadcasts; per-round state is eagerly pinned
      // (64 doubles) so round k never re-runs rounds 1..k-1.
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val mu = e.select(posexplode(col("v")).as(Seq("dim0", "x")))
        .withColumn("xq", floor(col("x") * lit(1e7)).cast("long"))
        .groupBy(col("dim0")).agg(count(lit(1)).as("n"), sum(col("xq")).as("sq"))
        .select(col("dim0"), (col("sq").cast("double") / lit(1e7) / col("n")).as("mu"))
      val muArr = mu.agg(expr(
        "transform(sort_array(collect_list(struct(dim0, mu))), p -> p.mu)").as("mu"))
        .localCheckpoint()
      var vArr = muArr.select(expr(
        "transform(sequence(1, 64), j -> CAST(0.125 AS DOUBLE))").as("pv"))
        .localCheckpoint()
      for (_ <- 1 to 4) {
        val joined = e.crossJoin(broadcast(muArr)).crossJoin(broadcast(vArr))
          .withColumn("dot", expr(
            "aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, j) -> " +
              "acc + (element_at(v, j) - element_at(mu, j)) * element_at(pv, j))"))
        val w = joined.select(posexplode(expr(
            "transform(sequence(1, 64), j -> CAST(floor(1e6 * " +
              "(element_at(v, j) - element_at(mu, j)) * dot) AS BIGINT))"))
            .as(Seq("dim0", "q")))
          .groupBy(col("dim0")).agg(sum(col("q")).as("wq"))
        vArr = w.agg(expr(
            "transform(sort_array(collect_list(struct(dim0, wq))), p -> CAST(p.wq AS DOUBLE))")
            .as("w"))
          .select(expr(
            "transform(w, x -> x / sqrt(aggregate(w, CAST(0 AS DOUBLE), " +
              "(acc, y) -> acc + y * y)))").as("pv"))
          .localCheckpoint()
      }
      ordered(mu.crossJoin(broadcast(vArr))
        .select(col("dim0").cast("long").as("dim"), col("mu"),
          expr("element_at(pv, CAST(dim0 + 1 AS INT))").as("loading")))
    },
    "q_embed_centroid" -> { (s, dir) =>
      val e = Tables(s, dir, "embeddings")
      val q = e.select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "x")))
        .withColumn("xq", floor(col("x") * lit(1e7)).cast("long"))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("xq")).as("sum_q"))
      ordered(q.select(col("label"), col("dim"), col("n"),
        col("sum_q"),
        (col("sum_q").cast("double") / lit(1e7) / col("n")).as("centroid")))
    },
    "q_embed_outliers" -> { (s, dir) =>
      // Embedding-norm outlier gate (added r9) — the QA pass an
      // embedding pipeline runs before indexing/training: a vector
      // whose L2 norm sits far from its label's distribution usually
      // means a broken encoder batch, truncated input, or mis-scaled
      // normalization. Per-label z-score of the squared norm, flagged
      // at |z| > 2.
      //
      // Determinism: norm_q = Σ floor(x²·1e6) is an exact per-row
      // BIGINT (left-fold, engine-identical); label moments (n, Σ, Σ²)
      // sum as DECIMAL(38,0) (the q_time_trend headroom rule — norm_q²
      // ≈ 4e15 would overflow int64 under a ×10 soak), and the outlier
      // verdict compares INTEGERS only: z² > 4 ⟺ (n·x−S1)² > 4·(n·S2−S1²).
      // z itself is one shared IEEE expression over the same integers.
      //
      // 100 TB posture: one narrow map (norm at scan speed) + a
      // |labels|-row hash agg with map-side partials + a broadcast
      // join of the |labels|-row moment table back onto the corpus —
      // the classic two-pass profile, nothing shuffles but the report.
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("norm_q", expr(
          "aggregate(v, 0L, (a, x) -> a + CAST(FLOOR(x * x * 1e6) AS BIGINT))"))
      val m = e.groupBy(col("label")).agg(
        count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("norm_q").cast("decimal(38,0)")).as("s1"),
        sum(col("norm_q").cast("decimal(19,0)") *
          col("norm_q").cast("decimal(19,0)")).as("s2"))
      val j = e.join(broadcast(m), Seq("label"))
        .withColumn("dev", col("n") * col("norm_q").cast("decimal(38,0)") - col("s1"))
        .withColumn("varn", col("n") * col("s2") - col("s1") * col("s1"))
      ordered(j.select(col("vec_id"), col("label"), col("norm_q"),
        (col("dev").cast("double") / sqrt(col("varn").cast("double"))).as("z"),
        (col("dev") * col("dev") > col("varn") * lit(4).cast("decimal(38,0)"))
          .as("is_outlier")))
    },
    "q_embed_quantize" -> { (s, dir) =>
      // Int8 symmetric scalar quantization — the 4× compression step
      // before shipping an embedding corpus to an ANN index or a
      // training host: per-vector scale = 127/max|x|, component
      // q_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. floor(·+0.5)
      // rather than round(): floor is IEEE-defined identically in
      // every engine, so the quantized codes are bit-reproducible
      // (round's half-even/half-up variance across engines is not).
      // Narrow one-pass projection — no shuffle at all; at 100 TB
      // this is a pure map stage that runs at scan speed.
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val withScale = e
        .withColumn("maxabs",
          aggregate(col("v"), lit(0.0), (acc, x) => greatest(acc, abs(x))))
        .withColumn("scale", lit(127.0) / col("maxabs"))
      val q = transform(col("v"), x => floor(x * col("scale") + lit(0.5)).cast("int"))
      // scale is emitted raw: 127.0/max|x| is a single IEEE division of
      // bit-identical inputs, so it hash-matches the oracle exactly.
      ordered(withScale.withColumn("q", q)
        .select(col("vec_id"), col("scale"),
          array_join(col("q").cast("array<string>"), ",").as("q_csv"),
          size(filter(col("q"), x => abs(x) === lit(127))).cast("long").as("n_sat")))
    },
    "q_embed_kmeans" -> { (s, dir) =>
      // Distributed Lloyd k-means (k=8, two unrolled iterations) —
      // the coarse-quantizer / corpus-clustering step behind IVF
      // indexes and balanced data mixes; the trainer (and its
      // determinism contract) is the shared kmeans2 above, which
      // q_dedup_semdedup clusters with too.
      //
      // 100 TB posture (the MLlib shape, in pure Catalyst): the k
      // centroids are packed into ONE broadcast row and assignment is
      // a narrow map — transform+array_min over the centroid array,
      // all inside codegen, NO shuffle of the corpus. Only the
      // centroid recompute shuffles, and map-side partials collapse
      // it to k·dim rows per partition first. Iterations scale
      // linearly; k scales to ~1e5 before the broadcast row matters.
      graft.functions.VectorExprs.register(s)
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (a2, c1) = kmeans2(e)
      val cent = c1.select(col("cid"), expr(
        "array_join(transform(cv, x -> CAST(CAST(floor(x * 1e7) AS BIGINT) AS STRING)), ',')")
        .as("centroid_q_csv"))
      ordered(a2.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("dist_q")).cast("long").as("distortion_q"),
          min(col("vec_id")).as("first_vec"))
        .join(broadcast(cent), Seq("cid")))
    },
    "q_embed_pq" -> { (s, dir) =>
      // Product quantization — the ANN-index compression step that
      // completes the quantize (scalar) / IVF (coarse) / SRP (binary)
      // family: each 64-dim vector compresses to 16 codebook ids
      // (16 codes per 4-dim subspace here; 256 per 8-dim at
      // production scale), 64 floats → 16 small ints, with reconstruction error carried
      // as the exact fixed-point l2 residual. Output: per-vector code
      // string + err_q. The ADC search path (query distance = sum of
      // per-subspace lookup distances) is pinned by the recall spec.
      //
      // 100 TB posture: training touches the corpus twice per Lloyd
      // pass (assign = narrow broadcast-codebook map; recompute =
      // hash-agg collapsing to sp·k·dim rows map-side); the codebook
      // is 16·16 rows of 4 doubles — driver/broadcast-bounded metadata
      // like IVF's centroids. Encoding new vectors is one narrow map.
      graft.functions.VectorExprs.register(s)
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (a2, _) = pqTrain(e)
      ordered(a2.groupBy(col("vec_id"))
        .agg(expr("array_join(transform(array_sort(collect_list(struct(sp, cid)))," +
            " p -> CAST(p.cid AS STRING)), ',')").as("codes_csv"),
          sum(col("dist_q")).cast("long").as("err_q")))
    },
    "q_embed_rproj" -> { (s, dir) =>
      // Random-projection dimensionality reduction (64 → 8) — the
      // cheap JL-style shrink before clustering/ANN when full dims
      // are overkill. The ±1 projection matrix is DERIVED, not
      // stored: sign(i,j) = parity of ((i·2654435761 + j·40503) mod
      // 97) — pure integer arithmetic both engines reproduce exactly,
      // so no matrix broadcast, no randomness, and the whole operator
      // is a narrow one-pass map at scan speed (zero shuffle; at
      // 100 TB this runs as fast as the projection can be read).
      // Each output component is one left-assoc fold over the 64
      // inputs — the identical IEEE op sequence as the oracle's
      // list_reduce with a prepended 0.0, so doubles are bit-exact.
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val ps = (1 to 8).map { j =>
        expr(("aggregate(sequence(1, 64), cast(0.0 as double), (acc, i) -> " +
          s"acc + element_at(v, i) * CASE WHEN (i * 2654435761L + $j * 40503L) " +
          "% 97 % 2 = 0 THEN 1.0D ELSE -1.0D END)")).as(s"p$j")
      }
      ordered(e.select(col("vec_id") +: ps: _*))
    }
  )

  /** DuckDB CTE chain replaying [[pqTrain]] exactly (subvectors →
    * init → assign → recompute → re-assign); shared by the q_embed_pq
    * oracle and q_sim_pq_adc's (Similarity.scala), which extends it
    * with the LUT/ADC search stages. */
  /** DuckDB replay of kmeans2 (two unrolled Lloyd iterations, k=8) —
    * the shared oracle CTE chain behind q_embed_kmeans and
    * q_dedup_semdedup. Exposes `e` (vec_id, v) and `a2` (vec_id, cid,
    * dq), the final assignment. */
  private[graft] val kmeansCtes: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |init AS (SELECT CAST(vec_id AS INT) AS cid, v AS cv FROM e WHERE vec_id < 8),
      |d1 AS (
      |  SELECT e.vec_id, e.v, i.cid,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      j -> CAST(FLOOR((e.v[j] - i.cv[j]) * (e.v[j] - i.cv[j]) * 1e12)
      |        AS BIGINT))) AS BIGINT) AS dq
      |  FROM e CROSS JOIN init i),
      |a1 AS (
      |  SELECT vec_id, v, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dq, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |cd AS (
      |  SELECT cid, u.j AS dim, COUNT(*) AS n,
      |    CAST(SUM(CAST(FLOOR(v[u.j] * 1e7) AS BIGINT)) AS BIGINT) AS sq
      |  FROM a1, (SELECT unnest(range(1, 65)) AS j) u
      |  GROUP BY cid, u.j),
      |c1 AS (
      |  SELECT cid, list(CAST(sq AS DOUBLE) / 1e7 / n ORDER BY dim) AS cv
      |  FROM cd GROUP BY cid),
      |d2 AS (
      |  SELECT e.vec_id, c.cid,
      |    CAST(list_sum(list_transform(range(1, 65),
      |      j -> CAST(FLOOR((e.v[j] - c.cv[j]) * (e.v[j] - c.cv[j]) * 1e12)
      |        AS BIGINT))) AS BIGINT) AS dq
      |  FROM e CROSS JOIN c1 c),
      |a2 AS (
      |  SELECT vec_id, cid, dq FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dq, cid) AS rn
      |    FROM d2) WHERE rn = 1)""".stripMargin

  private[graft] val pqCtes: String =
    """e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sub AS (
      |  SELECT vec_id, s.sp, list_transform(range(1, 5), j -> v[s.sp * 4 + j]) AS sv
      |  FROM e, (SELECT unnest(range(0, 16)) AS sp) s),
      |init AS (SELECT sp, CAST(vec_id AS INT) AS cid, sv AS cv
      |  FROM sub WHERE vec_id < 16),
      |d1 AS (
      |  SELECT sub.vec_id, sub.sp, sub.sv, i.cid,
      |    CAST(list_sum(list_transform(range(1, 5),
      |      j -> CAST(FLOOR((sub.sv[j] - i.cv[j]) * (sub.sv[j] - i.cv[j]) * 1e12)
      |        AS BIGINT))) AS BIGINT) AS dq
      |  FROM sub JOIN init i ON sub.sp = i.sp),
      |a1 AS (
      |  SELECT vec_id, sp, sv, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sp ORDER BY dq, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |cd AS (
      |  SELECT sp, cid, u.j AS dim, COUNT(*) AS n,
      |    CAST(SUM(CAST(FLOOR(sv[u.j] * 1e7) AS BIGINT)) AS BIGINT) AS sq
      |  FROM a1, (SELECT unnest(range(1, 5)) AS j) u
      |  GROUP BY sp, cid, u.j),
      |c1 AS (
      |  SELECT sp, cid, list(CAST(sq AS DOUBLE) / 1e7 / n ORDER BY dim) AS cv
      |  FROM cd GROUP BY sp, cid),
      |d2 AS (
      |  SELECT sub.vec_id, sub.sp, c.cid,
      |    CAST(list_sum(list_transform(range(1, 5),
      |      j -> CAST(FLOOR((sub.sv[j] - c.cv[j]) * (sub.sv[j] - c.cv[j]) * 1e12)
      |        AS BIGINT))) AS BIGINT) AS dq
      |  FROM sub JOIN c1 c ON sub.sp = c.sp),
      |a2 AS (
      |  SELECT vec_id, sp, cid, dq FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sp ORDER BY dq, cid) AS rn
      |    FROM d2) WHERE rn = 1)""".stripMargin

  /** DuckDB twin of q_embed_pca: the identical 4 power-iteration
    * rounds as chained CTEs — per-row dots via list_reduce with the
    * same left-assoc order (prepended 0.0, rproj precedent), the same
    * floor(1e6·) per-contribution quantization, and the same
    * fold-of-squares norm. */
  private def pcaOracleSql: String = {
    val rounds = (1 to 4).map { r =>
      s"""dt$r AS (
        |  SELECT e.vec_id, e.v,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65),
        |      j -> (e.v[j] - m.mu[j]) * p.pv[j])), (a, x) -> a + x) AS dot
        |  FROM e, muarr m, v${r - 1} p),
        |w$r AS (
        |  SELECT u.j AS j, CAST(SUM(CAST(FLOOR(1e6 * (d.v[u.j] - m.mu[u.j]) * d.dot)
        |    AS BIGINT)) AS BIGINT) AS wq
        |  FROM dt$r d, muarr m, (SELECT unnest(range(1, 65)) AS j) u
        |  GROUP BY u.j),
        |v$r AS (
        |  SELECT list_transform(warr, x -> x / sqrt(list_reduce(
        |    list_prepend(CAST(0 AS DOUBLE), list_transform(warr, y -> y * y)),
        |    (a, b) -> a + b))) AS pv
        |  FROM (SELECT list(CAST(wq AS DOUBLE) ORDER BY j) AS warr FROM w$r))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |mu0 AS (
      |  SELECT u.j AS j, COUNT(*) AS n,
      |    CAST(SUM(CAST(FLOOR(v[u.j] * 1e7) AS BIGINT)) AS BIGINT) AS sq
      |  FROM e, (SELECT unnest(range(1, 65)) AS j) u GROUP BY u.j),
      |mu AS (SELECT j, CAST(sq AS DOUBLE) / 1e7 / n AS mu FROM mu0),
      |muarr AS (SELECT list(mu ORDER BY j) AS mu FROM mu),
      |v0 AS (SELECT list_transform(range(1, 65), j -> CAST(0.125 AS DOUBLE)) AS pv),
      |$rounds
      |SELECT CAST(m.j - 1 AS BIGINT) AS dim, m.mu AS mu, v4.pv[m.j] AS loading
      |FROM mu m, v4""".stripMargin +
      orderByAll("dim", "mu", "loading")
  }

  def oracle: Map[String, String] = Map(
    "q_embed_rproj" ->
      (("SELECT vec_id, " + (1 to 8).map { j =>
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
          "list_transform(range(1, 65), i -> CAST(embedding[i] AS DOUBLE) * " +
          s"CASE WHEN (i * 2654435761 + $j * 40503) % 97 % 2 = 0 " +
          s"THEN 1.0 ELSE -1.0 END)), (a, b) -> a + b) AS p$j"
      }.mkString(", ") + " FROM embeddings") +
        orderByAll("vec_id" +: (1 to 8).map(j => s"p$j"): _*)),
    "q_embed_pca" -> pcaOracleSql,
    "q_embed_outliers" ->
      ("""WITH e AS (
        |  SELECT vec_id, label,
        |    CAST(list_sum(list_transform(embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * x * 1e6) AS BIGINT)))
        |      AS BIGINT) AS norm_q
        |  FROM embeddings),
        |m AS (
        |  SELECT label, CAST(COUNT(*) AS HUGEINT) AS n,
        |    CAST(SUM(CAST(norm_q AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(SUM(CAST(norm_q AS HUGEINT) * norm_q) AS HUGEINT) AS s2
        |  FROM e GROUP BY label),
        |fin AS (
        |  SELECT vec_id, e.label AS label, norm_q,
        |    CAST(CAST(n * norm_q - s1 AS VARCHAR) AS DOUBLE) /
        |      sqrt(CAST(CAST(n * s2 - s1 * s1 AS VARCHAR) AS DOUBLE)) AS z,
        |    (n * norm_q - s1) * (n * norm_q - s1) > 4 * (n * s2 - s1 * s1)
        |      AS is_outlier
        |  FROM e JOIN m ON e.label = m.label)
        |SELECT vec_id, label, norm_q, z, is_outlier FROM fin""".stripMargin +
        orderByAll("vec_id", "label", "norm_q", "z", "is_outlier")),
    "q_embed_centroid" ->
      ("""WITH ex AS (
        |  SELECT label, CAST(u.i - 1 AS INT) AS dim,
        |    CAST(FLOOR(CAST(embedding[u.i] AS DOUBLE) * 1e7) AS BIGINT) AS xq
        |  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u)
        |SELECT label, dim, COUNT(*) AS n,
        |  CAST(SUM(xq) AS BIGINT) AS sum_q,
        |  CAST(SUM(xq) AS DOUBLE) / 1e7 / COUNT(*) AS centroid
        |FROM ex GROUP BY label, dim""".stripMargin +
        orderByAll("label", "dim", "n", "sum_q", "centroid")),
    "q_embed_quantize" ->
      ("""WITH m AS (
        |  SELECT vec_id,
        |    127.0 / list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT e.vec_id, m.scale,
        |    list_transform(e.embedding,
        |      x -> CAST(FLOOR(CAST(x AS DOUBLE) * m.scale + 0.5) AS INT)) AS qv
        |  FROM embeddings e JOIN m ON e.vec_id = m.vec_id)
        |SELECT vec_id, scale, array_to_string(qv, ',') AS q_csv,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
        |FROM q""".stripMargin +
        orderByAll("vec_id", "scale", "q_csv", "n_sat")),
    "q_embed_pq" ->
      (s"""WITH $pqCtes
        |SELECT vec_id,
        |  array_to_string(list(CAST(cid AS VARCHAR) ORDER BY sp), ',') AS codes_csv,
        |  CAST(SUM(dq) AS BIGINT) AS err_q
        |FROM a2 GROUP BY vec_id""".stripMargin +
        orderByAll("vec_id", "codes_csv", "err_q")),
    "q_embed_kmeans" ->
      (s"""WITH $kmeansCtes,
        |cent AS (
        |  SELECT cid, array_to_string(list_transform(cv,
        |    x -> CAST(CAST(FLOOR(x * 1e7) AS BIGINT) AS VARCHAR)), ',')
        |    AS centroid_q_csv
        |  FROM c1),
        |fin AS (
        |  SELECT a2.cid, COUNT(*) AS n_points,
        |    CAST(SUM(dq) AS BIGINT) AS distortion_q,
        |    MIN(vec_id) AS first_vec, cent.centroid_q_csv
        |  FROM a2 JOIN cent ON a2.cid = cent.cid
        |  GROUP BY a2.cid, cent.centroid_q_csv)
        |SELECT cid, n_points, distortion_q, first_vec, centroid_q_csv
        |FROM fin""".stripMargin +
        orderByAll("cid", "n_points", "distortion_q", "first_vec",
          "centroid_q_csv"))
  )
}
