package graft

import org.apache.spark.sql.functions._

/** Error bounds for the sketch-based aggregate keys (oracle=omit:
  * sketch internals are engine-specific, so the gate is an accuracy
  * contract against the exact twins). */
class AggregatesSpec extends SparkSpec {

  test("approx_percentile within 5% of exact percentiles per group") {
    val exact = SparkEntry.queries("q_agg_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = SparkEntry.queries("q_agg_approx_percentile")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, (m, p90)) =>
      val (em, ep90) = exact(k)
      assert(math.abs(m - em) / em < 0.05, s"$k median approx=$m exact=$em")
      assert(math.abs(p90 - ep90) / ep90 < 0.05, s"$k p90 approx=$p90 exact=$ep90")
    }
  }

  test("hll sketch partials: union merge law holds and estimate near exact") {
    val c = graft.sources.Tables(spark, sf, "customer")
    val n = graft.sources.Tables(spark, sf, "nation")
    val joined = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    // direct per-region sketch, no intermediate partials
    val direct = joined.groupBy(col("n_regionkey"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(c_custkey, 12))")
        .cast("long").as("est"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    val viaPartials = SparkEntry.queries("q_agg_sketch_partial")(spark, sf)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    // merge law: unioning per-nation partials must reproduce the
    // direct sketch estimate exactly (same lgK, same algorithm)
    assert(viaPartials === direct)
    val exact = joined.groupBy(col("n_regionkey"))
      .agg(countDistinct(col("c_custkey")).as("nd"))
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    viaPartials.foreach { case (k, est) =>
      val ex = exact(k)
      assert(math.abs(est - ex).toDouble / ex < 0.05,
        s"region $k sketch=$est exact=$ex")
    }
  }

  test("approx_count_distinct within 10% of exact distinct counts per group") {
    val e = graft.sources.Tables(spark, sf, "events")
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("q_agg_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val ex = exact(k)
      assert(math.abs(a - ex).toDouble / ex < 0.10, s"$k approx=$a exact=$ex")
    }
  }
}
