package graft

/** graft.Explain is a diff surface — its value IS stability, so the
  * normalization contract gets its own spec. */
class ExplainSpec extends SparkSpec {

  test("normalize masks every run-varying token class") {
    assert(Explain.normalize("a#12 AS b#345") === "a#x AS b#x")
    assert(Explain.normalize("[plan_id=34] rdd:9") === "[plan_id=x] rdd:x")
    assert(Explain.normalize("file:/tmp/graft_stream_out123/part-0.parquet")
      === "file:/tmp/_")
    assert(Explain.normalize("Foo$$Lambda$4082/0x00007f136d1dddc8@68fce3e5")
      === "Foo$$Lambda@x")
    // multi-distinct gid digits mask (they are hash-order-assigned)
    assert(Explain.normalize("FILTER (WHERE (gid#7 = 2))")
      === "FILTER (WHERE (gid#x = n))")
  }

  test("detail-line lists canonicalize: order-insensitive, elements preserved") {
    val a = Explain.canonDetailLine("Keys [3]: [b#x, a#x, gid#x]")
    val b = Explain.canonDetailLine("Keys [3]: [a#x, b#x, gid#x]")
    assert(a === b)
    assert(a.contains("a#x") && a.contains("b#x") && a.contains("gid#x"))
    // non-detail lines pass through untouched (expression arg order is
    // meaningful there)
    val cond = "Condition : (slice(tk#x, s#x, 16) = x)"
    assert(Explain.canonDetailLine(cond) === cond)
  }

  test("a key's section is byte-identical across two builds in one session") {
    // q_profile_table is the hard case: its two countDistincts go
    // through RewriteDistinctAggregates, whose Expand group order is a
    // fresh exprId-hash order on every build
    for (k <- Seq("q_agg_group_pricing", "q_profile_table", "q_dedup_substring")) {
      val a = Explain.section(k, SparkEntry.queries(k)(spark, sf))
      val b = Explain.section(k, SparkEntry.queries(k)(spark, sf))
      assert(a === b, s"unstable section for $k")
      assert(a.contains("md5="), s"missing leaf identity for $k")
    }
  }
}
