package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B10 (dedup half) — document deduplication over `documents`
  * (SURVEY.md §2 B10): exact (content hash), exact near-dup (prefix-
  * filtered Jaccard self-join), and the approximate 100 TB paths
  * (MinHash-LSH, SimHash) which are recall-tested rather than
  * oracle-checked.
  *
  * Shingling contract (mirrored in the oracle SQL): distinct WORD
  * trigrams over whitespace tokens, exact-set Jaccard (see
  * [[shingled]] for why word- not char-level).
  *
  * 100 TB posture — q_dedup_near_jaccard is NOT the naive O(n²) cross
  * join; it is a prefix-filtered similarity join (PPJoin-style, public
  * algorithm from Xiao et al., WWW'08):
  *   1. order every document's shingle set by global document
  *      frequency ascending (rarest first) — one broadcast join of the
  *      vocabulary;
  *   2. a pair can reach Jaccard ≥ t only if the two docs share a
  *      shingle within their length-(|A| - ceil(t·|A|) + 1) prefixes,
  *      so candidate generation explodes ONLY the prefixes (rare
  *      shingles → small, skew-free join);
  *   3. exact-verify candidates with integer set arithmetic
  *      (5·|A∩B| ≥ 4·|A∪B| ⇔ J ≥ 0.8 — no float threshold).
  *   Prefix math stays in integers (ceil(0.8·sz) = (4·sz+4) DIV 5) so
  *   the pruning bound is never weakened by float rounding.
  *   The shuffled volume is O(prefix tokens), not O(n²); identical
  *   output to the oracle's brute-force join.
  */
object Dedup {

  /** doc_id + distinct word-3gram shingles + set size.
    *
    * Shingles are WORD trigrams, not char trigrams: the fixture's
    * char-3gram vocabulary is ~400 shingles across 5k docs (every
    * shingle in ~25% of docs), which defeats any candidate pruning —
    * prefix filtering passed 93% of all pairs at sf0.1. Word trigrams
    * give a combinatorial vocabulary (27k at sf0.1, max df 25), the
    * standard shingling for document dedup, and a sharp cliff between
    * planted near-dups (J ≥ 0.8) and background (J < 0.5). */
  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"), expr("filter(split(text, ' '), x -> x <> '')").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        expr("array_distinct(transform(sequence(0, size(t) - 3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2])))")
          .as("sh"))
      .withColumn("sz", size(col("sh")))

  /** Exact Jaccard ≥ 0.8 near-dup pairs via prefix filtering. */
  def nearDupPairs(d: DataFrame): DataFrame = {
    val sh = shingled(d)
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    // canonical global order: rarest shingle first, ties by value
    val canon = ex.join(broadcast(dfreq), "s")
      .groupBy(col("doc_id"))
      .agg(expr("transform(array_sort(collect_list(struct(df, s))), x -> x.s)").as("sh"))
      .withColumn("sz", size(col("sh")))
    val pref = canon.select(col("doc_id"), col("sz"),
      explode(expr("slice(sh, 1, sz - ((4 * sz + 4) DIV 5) + 1)")).as("s"))
    val cand = pref.as("a").join(pref.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: J ≥ 0.8 needs 4·|A| ≤ 5·|B| and 4·|B| ≤ 5·|A|
          col("a.sz") * 4 <= col("b.sz") * 5 && col("b.sz") * 4 <= col("a.sz") * 5)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val withA = cand.join(sh.select(col("doc_id").as("da"),
      col("sh").as("sha"), col("sz").as("sza")), "da")
    val pairs = withA.join(sh.select(col("doc_id").as("db"),
        col("sh").as("shb"), col("sz").as("szb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("uni", col("sza") + col("szb") - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 4)
    pairs.select(col("da"), col("db"),
      (col("inter").cast("double") / col("uni")).as("jaccard"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> { (s, dir) =>
      // canonical survivor per content hash: min doc_id + group size
      val d = Tables(s, dir, "documents")
      ordered(d.groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups")))
    },
    "q_dedup_near_jaccard" -> { (s, dir) =>
      ordered(nearDupPairs(Tables(s, dir, "documents")))
    },
    "q_dedup_minhash" -> { (s, dir) =>
      // Approximate 100 TB path: banded MinHash-LSH candidates, exact
      // Jaccard on survivors. Oracle=omit (LSH recall < 1); DedupSpec
      // bounds recall vs the exact q_dedup_near_jaccard output.
      minhashPairs(Tables(s, dir, "documents"), simThreshold = 0.8)
    },
    "q_dedup_simhash" -> { (s, dir) =>
      graft.functions.VectorExprs.register(s)
      // 64-bit SimHash (native codegen expression, ±1 token votes);
      // pairs within hamming distance 6. EXACT banded join, not O(n²):
      // the signature splits into 8 byte-chunks, and by pigeonhole any
      // pair within hamming ≤ 7 shares at least one chunk — so joining
      // on (chunk_idx, chunk_value) generates every qualifying pair
      // (recall 1.0) with an O(n·8) shuffle. Oracle=omit (hash family
      // is engine-internal); equality with the brute-force join is
      // asserted in DedupSpec.
      val d = Tables(s, dir, "documents")
      val sig = d.select(col("doc_id"), Text.simhash64(col("text")).as("sig"))
      val chunks = sig.select(col("doc_id"),
        posexplode(expr("transform(sequence(0, 7), i -> shiftright(sig, i * 8) & 255)"))
          .as(Seq("chunk", "cv")))
      val cand = chunks.as("a").join(chunks.as("b"),
          col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db")).distinct()
      val p = cand
        .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")), "da")
        .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")), "db")
        .withColumn("hamming", bit_count(col("siga").bitwiseXOR(col("sigb"))))
        .filter(col("hamming") <= 6)
      ordered(p.select(col("da"), col("db"), col("hamming")))
    },
    "q_dedup_embed" -> { (s, dir) =>
      // embedding-cosine near-dup pairs at τ=0.45 (fixture max ≈ 0.51)
      graft.functions.VectorExprs.register(s)
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val p = e.select(col("vec_id").as("va"), col("v").as("a"))
        .join(e.select(col("vec_id").as("vb"), col("v").as("b")),
          col("va") < col("vb"))
        .withColumn("cosine", Similarity.cosine(col("a"), col("b")))
        .filter(col("cosine") >= lit(0.45))
      ordered(p.select(col("va"), col("vb"), round(col("cosine"), 4).as("cosine")))
    }
  )

  /** Banded MinHash-LSH near-dup pairs (the 100 TB dedup path):
    *
    *   1. 64-hash signature per doc via the codegen
    *      [[graft.functions.MinHashSignature]] expression — linear pass;
    *   2. 16 bands × 4 rows: band key = xxhash64 of the 4-long slice;
    *      a pair collides in a band with prob J⁴ (J=0.8 → ≥99.9%
    *      overall, J=0.5 → 64%, J=0.3 → 12%) — the shuffle carries
    *      only (band, bucket) keys, volume O(n·b), never O(n²);
    *   3. signature-estimated Jaccard prefilter (cheap 64-long
    *      compare) at est ≥ 0.65 kills the mid-similarity background
    *      before any set materialization;
    *   4. exact Jaccard verify on the survivors only.
    *
    * MLlib's MinHashLSH.approxSimilarityJoin uses 1-row bands, so at
    * this fixture's similarity profile (~38% of pairs at J ≥ 0.5) it
    * degenerates to a near-cross-join with sparse-vector distances —
    * measured minutes at sf0.1; this formulation is seconds. */
  def minhashPairs(d: DataFrame, simThreshold: Double): DataFrame = {
    graft.functions.VectorExprs.register(d.sparkSession)
    val sh = shingled(d)
    val sig = sh.select(col("doc_id"),
      call_function("minhash_sig", col("sh"), lit(64)).as("sig"))
    val bands = sig.select(col("doc_id"),
      posexplode(expr("transform(sequence(0, 15), i -> xxhash64(slice(sig, i * 4 + 1, 4)))"))
        .as(Seq("band", "bh")))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val est = cand
      .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")), "da")
      .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")), "db")
      .filter(expr("aggregate(zip_with(siga, sigb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
        >= lit((0.65 * 64).toInt))
    val verified = est.select(col("da"), col("db"))
      .join(sh.select(col("doc_id").as("da"), col("sh").as("sha"), col("sz").as("sza")), "da")
      .join(sh.select(col("doc_id").as("db"), col("sh").as("shb"), col("sz").as("szb")), "db")
      .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= lit(simThreshold))
    ordered(verified.select(col("da"), col("db"), round(col("jaccard"), 4).as("jaccard")))
  }

  /** DuckDB twin of [[shingled]] (word trigrams over non-empty
    * whitespace tokens, docs with ≥3 tokens). */
  private val shTableSql =
    """sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t)-1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |        FROM documents) WHERE len(t) >= 3)""".stripMargin

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      ("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin +
        orderByAll("content_hash", "keep_id", "n_dups")),
    "q_dedup_near_jaccard" ->
      // brute-force twin of the prefix-filtered join: integer-exact
      // threshold, double jaccard only in the projection
      (s"""WITH $shTableSql,
        |pairs AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db,
        |    len(list_intersect(a.sh, b.sh)) AS inter,
        |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT da, db, CAST(inter AS DOUBLE) / uni AS jaccard
        |FROM pairs WHERE inter * 5 >= uni * 4""".stripMargin +
        orderByAll("da", "db", "jaccard")),
    "q_dedup_embed" ->
      (s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) /
        |    (sqrt(list_sum(list_transform(range(1,65), i -> CAST(a.embedding[i] AS DOUBLE) * a.embedding[i]))) *
        |     sqrt(list_sum(list_transform(range(1,65), i -> CAST(b.embedding[i] AS DOUBLE) * b.embedding[i])))) AS c
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id)
        |SELECT va, vb, ROUND(c, 4) AS cosine FROM p WHERE c >= 0.45""".stripMargin +
        orderByAll("va", "vb", "cosine"))
  )
}
