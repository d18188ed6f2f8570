package graft

/** Text-family keys whose semantics are engine-internal (no DuckDB
  * oracle): validated against their exact twins. */
class TextSpec extends SparkSpec {

  test("bloom decontamination flags a superset of the exact twin, never misses") {
    def perDoc(key: String): Map[Long, Long] =
      SparkEntry.queries(key)(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared")).toMap
    val exact = perDoc("q_text_decontaminate")
    val bloom = perDoc("q_text_decontaminate_bloom")
    assert(exact.nonEmpty, "fixture has no planted contamination")
    // bloom filters have no false negatives: every truly-contaminated
    // doc is flagged, with at least the exact shared-shingle count
    exact.foreach { case (id, n) =>
      assert(bloom.contains(id), s"doc $id contaminated but not flagged by bloom")
      assert(bloom(id) >= n, s"doc $id bloom count ${bloom(id)} < exact $n")
    }
    // false-positive pressure stays small at the configured bits/items
    assert(bloom.size <= exact.size + math.max(2, exact.size / 20),
      s"bloom flagged ${bloom.size} docs vs ${exact.size} exact — FP rate too high")
  }
}
