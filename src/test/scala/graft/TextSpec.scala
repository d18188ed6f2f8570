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

  test("q_text_bpe: greedy merge fold matches reference semantics; training is deterministic") {
    // the fold is the subtle half of BPE: greedy LEFT-TO-RIGHT,
    // non-overlapping, and a just-merged symbol must not re-merge in
    // the same round — pin it against a scala reference on the corner
    // cases (overlap runs, seeded head, singleton)
    def sparkFold(syms: Seq[String], l: String, r: String): Seq[String] = {
      import spark.implicits._
      Seq((syms, l, r)).toDF("syms", "lsym", "rsym")
        .selectExpr("aggregate(slice(syms, 2, size(syms) - 1), array(element_at(syms, 1)), " +
          "(acc, x) -> IF(element_at(acc, -1) = lsym AND x = rsym, " +
          "concat(slice(acc, 1, size(acc) - 1), array(concat(lsym, rsym))), " +
          "concat(acc, array(x)))) AS out")
        .collect().head.getSeq[String](0)
    }
    def refFold(syms: Seq[String], l: String, r: String): Seq[String] =
      syms.tail.foldLeft(List(syms.head)) { (acc, x) =>
        if (acc.last == l && x == r) acc.init :+ (l + r) else acc :+ x
      }
    for ((syms, l, r) <- Seq(
        (Seq("a", "a", "a"), "a", "a"),         // odd run: merge first pair only
        (Seq("a", "a", "a", "a"), "a", "a"),    // even run: two merges
        (Seq("b", "a", "a"), "b", "a"),         // merged symbol must not cascade
        (Seq("x"), "a", "a"),                   // singleton: untouched
        (Seq("e", "r", "e", "r"), "e", "r")))   // repeated pair, disjoint
      assert(sparkFold(syms, l, r) === refFold(syms, l, r), s"fold($syms, $l+$r)")

    // training output: 8 ranked merges, each concatenation actually a
    // substring of some corpus word, and byte-identical across runs
    val out1 = SparkEntry.queries("q_text_bpe")(spark, sf).collect()
    val out2 = SparkEntry.queries("q_text_bpe")(spark, sf).collect()
    assert(out1.map(_.toString) === out2.map(_.toString), "BPE training must be deterministic")
    // ordered() sorts by name-sorted columns (lsym first), so ranks
    // appear out of positional order — compare as a set of 1..8
    assert(out1.map(_.getLong(0)).sorted.toSeq === (1L to 8L), "ranks 1..8")
    val words = graft.sources.Tables(spark, sf, "documents")
      .selectExpr("explode(split(text, ' ')) AS w").distinct()
      .collect().map(_.getString(0)).toSet
    for (row <- out1) {
      val merged = row.getString(1) + row.getString(2)
      assert(words.exists(_.contains(merged)),
        s"merge '$merged' is not a substring of any corpus word")
    }
  }
}
