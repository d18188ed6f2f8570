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
  * Shingling contract (mirrored in the oracle SQL): distinct character
  * 3-grams of `text` (positions 1..len-2, 1-based), exact-set Jaccard.
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

  /** doc_id + distinct char-3gram shingles + set size. */
  private def shingled(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
        expr("array_distinct(transform(sequence(1, length(text) - 2), i -> substring(text, i, 3)))")
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
      // Approximate 100 TB path: MinHash-LSH candidate pairs with the
      // exact Jaccard distance MLlib computes on each candidate.
      // Oracle=omit (LSH recall < 1); DedupSpec bounds recall vs the
      // exact q_dedup_near_jaccard output.
      minhashPairs(Tables(s, dir, "documents"), threshold = 0.2)
    },
    "q_dedup_simhash" -> { (s, dir) =>
      // 64-bit SimHash over md5-derived token hashes; pairs within
      // hamming distance 6. Deterministic but not SQL-tractable in the
      // oracle dialect → oracle=omit, property-tested in DedupSpec.
      val d = Tables(s, dir, "documents")
      val sig = d.select(col("doc_id"), Text.simhash64(col("text")).as("sig"))
      val p = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("hamming",
          bit_count(expr("a.sig").bitwiseXOR(expr("b.sig"))))
        .filter(col("hamming") <= 6)
      ordered(p.select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("hamming")))
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

  /** MLlib MinHash-LSH pairs (deterministic seed). Public API:
    * org.apache.spark.ml.feature.{HashingTF, MinHashLSH}. */
  def minhashPairs(d: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sh = shingled(d)
    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val feats = tf.transform(sh)
    val mh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42L)
    val model = mh.fit(feats)
    val joined = model.approxSimilarityJoin(feats, feats, threshold, "jdist")
      .select(col("datasetA.doc_id").as("da"), col("datasetB.doc_id").as("db"),
        round(lit(1.0) - col("jdist"), 4).as("jaccard_est"))
      .filter(col("da") < col("db"))
    ordered(joined)
  }

  private val shSql =
    "list_distinct([text[i:i+2] for i in range(1, length(text)-1)])"

  def oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      ("""SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
        |  COUNT(*) AS n_dups
        |FROM documents GROUP BY md5(text)""".stripMargin +
        orderByAll("content_hash", "keep_id", "n_dups")),
    "q_dedup_near_jaccard" ->
      // brute-force twin of the prefix-filtered join: integer-exact
      // threshold, double jaccard only in the projection
      (s"""WITH sh AS (SELECT doc_id, $shSql AS sh FROM documents),
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
