package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.Det._
import graft.sources.Tables

/** Extensibility surface (SURVEY.md §7.5): the three user-extension
  * mechanisms demonstrated as oracle-checked operators — a scalar UDF,
  * a typed `Aggregator` UDAF, and a typed flatMap (the UDTF shape).
  *
  * Engine guidance stands: builtins and native expressions beat UDFs
  * in hot paths (blackbox to Catalyst — no pushdown through them, no
  * codegen). These keys exist to prove the extension points work and
  * stay deterministic; each mirrors semantics the oracle can express.
  */
object Extensibility {

  /** Scalar UDF: crude "syllable-ish" complexity score of a token —
    * consonant-run count. Pure, deterministic, and mirrored in the
    * oracle via regexp_replace/length arithmetic. */
  private val consonantRuns: String => Int = { s =>
    var runs = 0; var inRun = false
    s.foreach { c =>
      val cons = "bcdfghjklmnpqrstvwxyz".indexOf(c.toLower) >= 0
      if (cons && !inRun) runs += 1
      inRun = cons
    }
    runs
  }

  /** Typed Aggregator UDAF: exact decimal revenue — BigDecimal(4dp)
    * accumulation, matching DECIMAL(18,4) SUM semantics exactly.
    * BigDecimal.valueOf (shortest decimal representation, what
    * Catalyst's Cast and DuckDB both round from), NOT
    * new BigDecimal(double) (exact binary expansion) — the two differ
    * at the 4th decimal for ~1 in 10^5 rows, which surfaced as a
    * 1-ulp revenue divergence at sf0.1. */
  object RevenueAgg extends Aggregator[(Double, Double), java.math.BigDecimal, Double] {
    private def m(x: Double) =
      java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP)
    def zero: java.math.BigDecimal = java.math.BigDecimal.ZERO
    def reduce(b: java.math.BigDecimal, r: (Double, Double)): java.math.BigDecimal =
      b.add(m(r._1).multiply(java.math.BigDecimal.ONE.subtract(m(r._2))))
    def merge(a: java.math.BigDecimal, b: java.math.BigDecimal): java.math.BigDecimal = a.add(b)
    def finish(b: java.math.BigDecimal): Double = b.doubleValue()
    def bufferEncoder: Encoder[java.math.BigDecimal] = Encoders.DECIMAL
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_func_udf" -> { (s, dir) =>
      val udfScore = udf(consonantRuns)
      val p = Tables(s, dir, "part")
      ordered(p.select(col("p_partkey"), col("p_brand"))
        .withColumn("complexity", udfScore(col("p_brand")))
        .groupBy(col("p_brand"), col("complexity"))
        .agg(count(lit(1)).as("n_parts")))
    },
    "q_func_udaf" -> { (s, dir) =>
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val rev = udaf(RevenueAgg)
      ordered(li.groupBy(col("l_returnflag"))
        .agg(rev(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n")))
    },
    "q_func_udtf" -> { (s, dir) =>
      // typed flatMap = the table-function shape: one doc row → many
      // (lang, token-prefix) rows, then aggregated
      import s.implicits._
      val d = Tables(s, dir, "documents")
      val exploded = d.select(col("lang"), col("text")).as[(String, String)]
        .flatMap { case (lang, text) =>
          text.split(' ').iterator.filter(_.nonEmpty).map(t => (lang, t.take(2)))
        }.toDF("lang", "prefix")
      ordered(exploded.groupBy(col("lang"), col("prefix"))
        .agg(count(lit(1)).as("n")))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_func_udf" ->
      // consonant-run count == length after collapsing consonant runs
      // to one char and dropping non-consonants
      ("""SELECT p_brand,
        |  length(regexp_replace(regexp_replace(lower(p_brand), '[bcdfghjklmnpqrstvwxyz]+', 'C', 'g'), '[^C]', '', 'g')) AS complexity,
        |  COUNT(*) AS n_parts
        |FROM part GROUP BY 1, 2""".stripMargin +
        orderByAll("p_brand", "complexity", "n_parts")),
    "q_func_udaf" ->
      ("""SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin +
        orderByAll("l_returnflag", "revenue", "n")),
    "q_func_udtf" ->
      ("""SELECT lang, t[1:2] AS prefix, COUNT(*) AS n
        |FROM (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
        |      FROM documents)
        |GROUP BY 1, 2""".stripMargin +
        orderByAll("lang", "prefix", "n"))
  )
}
