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

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  private def fixtureToks(): Seq[(Long, Seq[String])] =
    graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toSeq

  test("q_text_ngram_lm matches an independent in-memory LM replay (r8)") {
    // train the identical add-one bigram model in plain Scala (own md5
    // split, own counting, own Math.log) and demand the per-doc
    // quantized NLL totals agree exactly — catches any silent drift in
    // the split rule, smoothing, context totals, or quantization
    val docs = fixtureToks()
    val (train, eval) = docs.partition { case (id, _) => md5Hex(id.toString) >= "1a" }
    val c2 = scala.collection.mutable.Map.empty[(String, String), Long]
    train.foreach { case (_, t) =>
      t.sliding(2).filter(_.size == 2).foreach(p =>
        c2((p(0), p(1))) = c2.getOrElse((p(0), p(1)), 0L) + 1) }
    val c1 = c2.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val v = train.flatMap(_._2).distinct.size
    val expected = eval.filter(_._2.size >= 2).map { case (id, t) =>
      id -> t.sliding(2).filter(_.size == 2).map { p =>
        val num = (c2.getOrElse((p(0), p(1)), 0L) + 1).toDouble
        val den = (c1.getOrElse(p(0), 0L) + v).toDouble
        -math.floor(1e6 * math.log(num / den)).toLong
      }.sum
    }.toMap
    val got = SparkEntry.queries("q_text_ngram_lm")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nll_total")).toMap
    assert(got.keySet === expected.keySet, "eval doc set mismatch")
    expected.foreach { case (id, nll) =>
      assert(got(id) === nll, s"doc $id: engine ${got(id)} vs replay $nll") }
  }

  test("q_text_entropy matches an independent in-memory recompute (r8)") {
    val expected = fixtureToks().filter(_._2.nonEmpty).map { case (id, t) =>
      val n = t.size.toLong
      val s = t.groupBy(identity).values
        .map(g => g.size * math.floor(1e6 * math.log(g.size.toDouble)).toLong).sum
      val num = n * math.floor(1e6 * math.log(n.toDouble)).toLong - s
      id -> (num.toDouble / (n.toDouble * 1e6))
    }.toMap
    val got = SparkEntry.queries("q_text_entropy")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("entropy_nats")).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, h) =>
      assert(got(id) === h, s"doc $id: engine ${got(id)} vs replay $h")
      assert(h >= 0.0, s"entropy negative for doc $id") }
  }

  test("q_sample_temperature flattens the head: rates are anti-monotone in source size (r8)") {
    val rows = SparkEntry.queries("q_sample_temperature")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("rate_ppm"), r.getAs[Long]("n_kept")))
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, ppm, kept) =>
      assert(ppm >= 0 && ppm <= 1000000, s"$src rate out of range: $ppm")
      assert(kept >= 0 && kept <= n, s"$src kept $kept of $n") }
    // temperature property: a strictly larger source never gets a
    // strictly larger keep RATE (∝ n^(α-1), α = 1/2 → decreasing)
    for (w <- rows.sortBy(_._2).sliding(2) if w.length == 2) {
      val (sa, na, ra, _) = w(0); val (sb, nb, rb, _) = w(1)
      if (na < nb)
        assert(rb <= ra, s"rate not anti-monotone: $sa($na)→$ra vs $sb($nb)→$rb")
    }
  }

  test("q_text_langid_rank: confusion matrix partitions the eval split (r8)") {
    val rows = SparkEntry.queries("q_text_langid_rank")(spark, sf).collect()
      .map(r => (r.getAs[String]("actual_lang"), r.getAs[String]("predicted_lang"),
        r.getAs[Long]("n_docs")))
    assert(rows.nonEmpty)
    // every eval doc is classified exactly once (no drops, no dupes)
    val d = graft.sources.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
    val evalDocs = d.count(r =>
      md5Hex(r.getLong(0).toString) < "1a" && r.getString(1).length >= 3)
    assert(rows.map(_._3).sum === evalDocs.toLong,
      s"matrix covers ${rows.map(_._3).sum} docs of $evalDocs eval docs")
    // predictions come from the trained language set only
    assert(rows.map(_._2).toSet.subsetOf(
      graft.sources.Tables(spark, sf, "documents")
        .select("lang").distinct().collect().map(_.getString(0)).toSet))
  }

  test("q_text_bpe_apply: subword counts bounded by chars and words, corpus conserved (r8)") {
    val rows = SparkEntry.queries("q_text_bpe_apply")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_subwords")))
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, c, sub) =>
      // each word yields between 1 and len(word) subwords
      assert(w <= sub && sub <= c, s"doc $id: words=$w subwords=$sub chars=$c")
    }
    // merges actually fired: the corpus compressed below character level
    assert(rows.map(_._4).sum < rows.map(_._3).sum,
      "8 merges produced zero compression — apply path dead")
    // conservation: per-doc word counts sum to the corpus token count
    val toks = fixtureToks().map(_._2.size.toLong).sum
    assert(rows.map(_._2).sum === toks)
  }

  test("q_text_unigram_segment: Viterbi beats char-level, piece counts bounded (late r9)") {
    val rows = SparkEntry.queries("q_text_unigram_segment")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_pieces"), r.getAs[Double]("pieces_per_word")))
    assert(rows.nonEmpty)
    val charCounts = fixtureToks().map { case (id, t) =>
      id -> t.map(_.length.toLong).sum }.toMap
    rows.foreach { case (id, w, p, ppw) =>
      // each word yields between 1 piece and len(word) pieces
      assert(w <= p && p <= charCounts(id),
        s"doc $id: words=$w pieces=$p chars=${charCounts(id)}")
      assert(ppw >= 1.0, s"doc $id: pieces_per_word $ppw < 1")
    }
    // the DP genuinely chose multi-char pieces: corpus-wide pieces are
    // strictly below the char-level segmentation's count
    assert(rows.map(_._3).sum < rows.map(r => charCounts(r._1)).sum,
      "Viterbi never merged characters — DP path dead")
  }

  test("q_quality_classifier matches an independent in-memory scorer (r8)") {
    val stop = graft.operators.Text.Markers.en.toSet
    val expected = fixtureToks().filter(_._2.nonEmpty).map { case (id, t) =>
      val n = t.size.toLong
      val stopPpt = t.count(stop) * 1000L / n
      val uniqPpt = t.distinct.size * 1000L / n
      val pen = if (n < 20) 500L else if (n > 400) 300L else 0L
      val digits = t.count(_.forall(_.isDigit)).toLong
      val score = 2 * stopPpt + uniqPpt - pen - 5 * digits
      val band = if (score >= 1400) "high" else if (score >= 900) "mid" else "low"
      id -> (score, band)
    }.toMap
    val got = SparkEntry.queries("q_quality_classifier")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("score"), r.getAs[String]("band"))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) === e, s"doc $id: engine ${got(id)} vs replay $e") }
    // the fixture must actually exercise more than one band
    assert(got.values.map(_._2).toSet.size >= 2, "classifier collapsed to one band")
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

  test("nfc_normalize: composes decomposed text, identity fast-path, variants converge (r9)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.VectorExprs.register(spark)
    // decomposed e+U+0301 composes to U+00E9 (length shrinks by 1 per mark)
    val rows = Seq("cafe\u0301", "caf\u00e9", "plain ascii")
      .toDF("t").selectExpr("t", "nfc_normalize(t) AS n", "length(t) AS lt",
        "length(nfc_normalize(t)) AS ln").collect()
    assert(rows(0).getString(1) === rows(1).getString(1), "variants must converge")
    assert(rows(0).getInt(2) === 5 && rows(0).getInt(3) === 4)
    assert(rows(2).getString(0) === rows(2).getString(1), "ASCII is a no-op")
    // the operator key: composed length shrink fires exactly on %4==0,
    // and the canonical key of a %4==0 doc equals its %4==1 twin's
    // cleaned text shape (both end ' grafte\u0301...'->' graft\u00e9...')
    val out = SparkEntry.queries("q_text_normalize")(spark, sf).cache()
    try {
      assert(out.filter(col("doc_id") % 4 === 0)
        .filter(col("n_composed") =!= 2L).count() === 0,
        "both decomposed marks must compose on %4==0 docs")
      assert(out.filter(col("doc_id") % 4 =!= 0)
        .filter(col("n_composed") =!= 0L).count() === 0,
        "NFC must be a no-op off the decomposed class")
      // NBSP/doubled spaces collapse: cleaned text is strictly shorter
      assert(out.filter(col("doc_id") % 4 === 3)
        .filter(col("n_clean") >= col("n_nfc")).count() === 0)
    } finally out.unpersist()
  }
}
