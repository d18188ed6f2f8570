package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.plans.RewriteCosineThresholdJoin
import graft.sources.Tables

/** The LSH rewrite rule: plan shape, flag gating, and recall of the
  * rewritten query vs the brute-force original. */
class RewriteSpec extends SparkSpec {

  private def bruteQuery() = {
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    e.select(col("vec_id").as("va"), col("v").as("a"))
      .join(e.select(col("vec_id").as("vb"), col("v").as("b")), col("va") < col("vb"))
      .filter(Similarity.cosine(col("a"), col("b")) >= lit(0.4))
      .select("va", "vb")
  }

  test("rule rewrites cosine-threshold join to banded LSH join when enabled") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteCosineThresholdJoin
    try {
      spark.conf.set(RewriteCosineThresholdJoin.Flag, "true")
      val rewritten = bruteQuery()
      val opt = rewritten.queryExecution.optimizedPlan.toString
      assert(opt.contains("srp_sig") || opt.contains("SrpSignature"),
        s"rewrite did not fire:\n$opt")
      assert(opt.contains("posexplode") || opt.contains("Generate"), opt)

      // flag off → untouched brute-force plan
      spark.conf.set(RewriteCosineThresholdJoin.Flag, "false")
      val plain = bruteQuery().queryExecution.optimizedPlan.toString
      assert(!plain.contains("srp_sig") && !plain.contains("Generate"), plain)

      // recall: rewritten results ⊆ exact, high recall at this τ
      spark.conf.set(RewriteCosineThresholdJoin.Flag, "true")
      val approx = bruteQuery().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      spark.conf.set(RewriteCosineThresholdJoin.Flag, "false")
      val exact = bruteQuery().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.subsetOf(exact), s"false positives: ${(approx -- exact).take(3)}")
      assume(exact.nonEmpty, "no pairs above τ at this sf")
      val recall = approx.size.toDouble / exact.size
      assert(recall >= 0.7, s"recall $recall (${approx.size}/${exact.size})")
    } finally {
      spark.conf.set(RewriteCosineThresholdJoin.Flag, "false")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteCosineThresholdJoin)
    }
  }
}
