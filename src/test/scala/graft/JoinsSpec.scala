package graft

import org.apache.spark.sql.functions._

/** Merge-family semantics beyond the oracle hash: the CDC override
  * chains asserted per key class against the staging rules. */
class JoinsSpec extends SparkSpec {

  test("q_merge_cdc: latest version wins, deletes tombstone, untouched keys pass through (r8)") {
    val state = SparkEntry.queries("q_merge_cdc")(spark, sf).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        (r.getAs[String]("status"), r.getAs[Double]("price"), r.getAs[Long]("version")))
      .toMap
    val orders = graft.sources.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(orders.nonEmpty)
    orders.foreach { case (k, (price, status)) =>
      if (k % 13 == 0)
        assert(!state.contains(k), s"deleted key $k survived compaction")
      else if (k % 7 == 0) {
        val (st, p, v) = state(k)
        assert(v === 2L && st === "P", s"updated key $k not at v2/P: $v/$st")
        assert(p === price * 1.1, s"updated key $k price $p != ${price * 1.1}")
      } else {
        val (st, p, v) = state(k)
        assert(v === 1L && st === status && p === price,
          s"untouched key $k mutated: $v/$st/$p")
      }
    }
    // conservation: exactly the non-deleted keys appear once
    assert(state.size === orders.keys.count(_ % 13 != 0))
  }
}
