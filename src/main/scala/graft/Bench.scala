package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM/codegen warmup
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2fs")
      name -> sec
    }.toMap
    def jsonLine(rs: Map[String, Double]): String = {
      val qs = rs.toSeq.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
      val total = if (results.nonEmpty) results.values.sum else 0.0
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Full per-key map goes to the sidecar file only: the driver captures
    // a bounded tail of stdout (BENCH_r01/r02 both show a 2000-char tail
    // with parsed=null — the 132-key map made the final line ~5 KB, so the
    // line STARTED before the tail window and never parsed). The stdout
    // line therefore carries the total plus a fixed headline subset and
    // must stay well under that window.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH.json"), jsonLine(results) + "\n")
    catch { case _: Throwable => () }
    val headline = Seq(
      "q_agg_group_pricing", "q_scan_filter_pushdown", "q_join_multiway",
      "q_sql_tpch_q3", "q_win_topk_group", "q_sessionize",
      "q_dedup_near_jaccard", "q_dedup_minhash", "q_sim_lsh_bucketed",
      "q_text_tfidf", "q_time_tumbling", "s_ingest_availablenow")
    val compact = jsonLine(results.view.filterKeys(headline.contains).toMap)
    require(compact.length < 1800, s"bench line too long: ${compact.length}")
    spark.stop()
    // JSON is the LAST stdout line: after spark.stop() (Spark logs go to
    // stderr, but stop before printing anyway), explicitly flushed.
    println(compact)
    System.out.flush()
  }
}
