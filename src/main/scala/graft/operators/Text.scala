package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** B10 (text half) — text analysis over the `documents` table:
  * tokenization + term frequencies, TF-IDF, per-language stats, and
  * n-gram counts (SURVEY.md §2 B10).
  *
  * Tokenization contract (mirrored exactly in the oracle SQL):
  * whitespace split on a single space, empty tokens dropped. The
  * fixture text is space-separated word soup (FIXTURES.md), so this is
  * a total tokenizer for it; a BPE-ish regex variant is exercised in
  * the ScalaTest spec, not the oracle keys.
  *
  * 100 TB posture: every key is explode → hash-aggregate — map-side
  * partial aggregation collapses the token stream before the shuffle,
  * so the shuffled volume is the vocabulary, not the corpus. TF-IDF
  * joins the per-term document frequency (vocabulary-sized, broadcast)
  * back to the (doc, term) TF relation — the big side never shuffles
  * twice.
  */
object Text {

  /** Spark-side tokens column; [[tokSql]] is its DuckDB twin. */
  private def toks(c: String = "text") =
    expr(s"filter(split($c, ' '), t -> t <> '')")
  private val tokSql = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** 64-bit SimHash document fingerprint over whitespace tokens,
    * via the native codegen [[graft.functions.SimHash64]] expression.
    * Callers must have run `VectorExprs.register` on the session.
    * Not oracle-checked (hash family is engine-internal). */
  def simhash64(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("simhash64", filter(split(c, " "), t => t =!= lit("")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_tokens_tf" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      ordered(d.select(col("doc_id"), explode(toks()).as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("tf"),
          countDistinct(col("doc_id")).as("df")))
    },
    "q_text_tfidf" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val docTerm = d.select(col("doc_id"), explode(toks()).as("term"))
      val tf = docTerm.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = docTerm.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      ordered(tf.join(broadcast(df), "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"), col("tf"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
            .as("tfidf")))
    },
    "q_text_lang_stats" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      ordered(d.groupBy(col("lang")).agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        (sum(size(toks())).cast("double") / count(lit(1))).as("avg_tokens")))
    },
    "q_text_ngrams" -> { (s, dir) =>
      val d = Tables(s, dir, "documents")
      val bigrams = d
        .withColumn("t", toks())
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))"))
          .as("bigram"))
      ordered(bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("n")))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_text_tokens_tf" ->
      (s"""SELECT term, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest($tokSql) AS term FROM documents)
        |GROUP BY term""".stripMargin +
        orderByAll("term", "tf", "df")),
    "q_text_tfidf" ->
      (s"""WITH dt AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM dt GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM dt GROUP BY 1)
        |SELECT tf.doc_id, tf.term, tf.tf,
        |  ROUND(tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / df.df), 4) AS tfidf
        |FROM tf JOIN df USING (term)""".stripMargin +
        orderByAll("doc_id", "term", "tf", "tfidf")),
    "q_text_lang_stats" ->
      (s"""SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  CAST(SUM(len($tokSql)) AS DOUBLE) / COUNT(*) AS avg_tokens
        |FROM documents GROUP BY lang""".stripMargin +
        orderByAll("lang", "n_docs", "avg_chars", "avg_tokens")),
    "q_text_ngrams" ->
      (s"""WITH t AS (SELECT $tokSql AS t FROM documents WHERE len($tokSql) >= 2)
        |SELECT bigram, COUNT(*) AS n
        |FROM (SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram FROM t)
        |GROUP BY bigram""".stripMargin +
        orderByAll("bigram", "n"))
  )
}
