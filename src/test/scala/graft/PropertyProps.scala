package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck property tests (SURVEY.md §5.2.3) over GENERATED data —
  * the fixture-independent invariants: sessionization gap laws, dedup
  * idempotence, minhash-estimate vs exact-Jaccard concentration,
  * cosine algebra. Runs on the shared local session; 10 trials per
  * property (each trial is a Spark job). */
object PropertyProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-props")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.VectorExprs.register(s)
    s
  }

  // --- sessionization: gap ≤ 30 min inside a session, > 30 min across ---

  private val genTimestamps: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 200000L)).map(_.distinct.sorted)

  property("sessionize partitions events; intra-gap<=30min, inter-gap>30min, events conserved") =
    forAll(genTimestamps) { tsSecs =>
      import spark.implicits._
      val base = 1700000000L
      val df = tsSecs.zipWithIndex
        .map { case (t, i) => (i.toLong, new java.sql.Timestamp((base + t) * 1000), 1L, "e", 1.0) }
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      val sessions = sessionizePlan(df).collect()
      val spans = sessions.map(r =>
        (r.getAs[java.sql.Timestamp]("session_start").getTime / 1000,
          r.getAs[java.sql.Timestamp]("session_end").getTime / 1000,
          r.getAs[Long]("n_events"))).sortBy(_._1)
      val conserved = spans.map(_._3).sum == tsSecs.size
      val ordered = spans.sliding(2).forall {
        case Array((_, e1, _), (s2, _, _)) => s2 - e1 > 1800
        case _ => true
      }
      // every in-session consecutive gap ≤ 30 min: check by re-deriving
      val all = tsSecs.map(_ + base)
      val intraOk = spans.forall { case (s, e, n) =>
        val inside = all.filter(t => t >= s && t <= e)
        inside.size == n && inside.sliding(2).forall {
          case List(a, b) => b - a <= 1800
          case _ => true
        }
      }
      conserved && ordered && intraOk
    }

  private def sessionizePlan(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    df.withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  // --- exact dedup idempotence ---

  property("dedup(dedup(x)) == dedup(x) and survivors unique") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd", "ee"))) { texts =>
      import spark.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      def dedup(d: DataFrame): DataFrame =
        d.groupBy(md5(col("text")).as("content_hash"))
          .agg(min(col("doc_id")).as("doc_id"))
      val once = dedup(df).count()
      val twice = dedup(dedup(df).withColumn("text", col("content_hash"))).count()
      once == twice && once == texts.distinct.size
    }

  // --- connected components == brute-force union-find on random graphs ---

  private val genEdges: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)
    es <- Gen.listOfN(n * 2, for {
      a <- Gen.choose(0L, n.toLong); b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield es

  property("large-star/small-star labels == brute-force union-find, any graph") =
    forAll(genEdges) { es =>
      import spark.implicits._
      val real = es.filter { case (a, b) => a != b }
      real.isEmpty || {
        // brute-force union-find ground truth
        val nodes = real.flatMap { case (a, b) => Seq(a, b) }.distinct
        val parent = scala.collection.mutable.Map(nodes.map(x => x -> x): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
        real.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val truth = nodes.map(x => x -> find(x)).toMap
        val (stars, _) = graft.operators.Dedup.connectedComponents(
          real.toDF("da", "db"))
        val got = stars.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        nodes.forall { x => got.getOrElse(x, x) == truth(x) }
      }
    }

  // --- minhash estimate concentrates around exact jaccard ---

  private val genTokenSets: Gen[(List[String], List[String])] = for {
    n <- Gen.choose(30, 60)
    overlap <- Gen.choose(0, n)
    vocabShift <- Gen.choose(1000, 2000)
  } yield {
    val shared = (0 until overlap).map(i => s"tok$i").toList
    val onlyA = (0 until (n - overlap)).map(i => s"a${i + vocabShift}").toList
    val onlyB = (0 until (n - overlap)).map(i => s"b${i + vocabShift}").toList
    (shared ++ onlyA, shared ++ onlyB)
  }

  property("minhash signature agreement ≈ exact jaccard (64 hashes, ±0.25)") =
    forAll(genTokenSets) { case (ta, tb) =>
      (ta.isEmpty || tb.isEmpty) || {
        import spark.implicits._
        val df = Seq((1L, ta), (2L, tb)).toDF("id", "toks")
          .withColumn("sig", call_function("minhash_sig", col("toks"), lit(64)))
        val sigs = df.orderBy("id").collect()
          .map(_.getSeq[Long](2))
        val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 64.0
        val inter = ta.toSet.intersect(tb.toSet).size
        val exact = inter.toDouble / (ta.toSet.size + tb.toSet.size - inter)
        math.abs(est - exact) <= 0.25
      }
    }

  // --- fuzzy join: segment pruning == brute force for arbitrary strings ---

  private val genNames: Gen[List[String]] = Gen.listOfN(25,
    for {
      n <- Gen.choose(1, 9) // includes the sub-3-char pigeonhole gap
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)

  property("fuzzyPairs == brute-force levenshtein join at k = 1, 2, 3, incl. short strings") =
    forAll(genNames) { raw =>
      import spark.implicits._
      // tiny alphabet + short strings force many in-threshold pairs
      // and plenty of length ≤ k names (the segment scheme's edge)
      val names = raw.distinct.map(n => (n, 1L)).toDF("name", "cnt")
      val ds = raw.distinct
      Seq(1, 2, 3).forall { k =>
        val got = graft.operators.Joins.fuzzyPairs(names, k)
          .select("na", "nb").collect().map(r => (r.getString(0), r.getString(1))).toSet
        val expected = (for {
          a <- ds; b <- ds if a < b
          if levenshteinRef(a, b) <= k
        } yield (a, b)).toSet
        got == expected
      }
    }

  // --- EWMA: Spark window formula bit-equals an independent fold ---

  property("q_time_ewma's tap formula is bit-exact vs a plain Scala fold") =
    forAll(Gen.listOfN(12, Gen.choose(-1000.0, 1000.0))) { xs =>
      import spark.implicits._
      // same left-associated op sequence, independently written: the
      // determinism claim is that ANY IEEE engine reproduces it
      def ref(w: Seq[Double]): Double =
        (w(7) + w(6) * 0.5 + w(5) * 0.25 + w(4) * 0.125 + w(3) * 0.0625 +
          w(2) * 0.03125 + w(1) * 0.015625 + w(0) * 0.0078125) / 1.9921875
      val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("bucket", "x")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      val got = df
        .withColumn("rn", row_number().over(w))
        .withColumn("ewma",
          (col("x")
            + lag(col("x"), 1).over(w) * 0.5
            + lag(col("x"), 2).over(w) * 0.25
            + lag(col("x"), 3).over(w) * 0.125
            + lag(col("x"), 4).over(w) * 0.0625
            + lag(col("x"), 5).over(w) * 0.03125
            + lag(col("x"), 6).over(w) * 0.015625
            + lag(col("x"), 7).over(w) * 0.0078125) / 1.9921875)
        .filter(col("rn") >= 8).orderBy(col("bucket"))
        .select("ewma").collect().map(_.getDouble(0)).toSeq
      val expected = (7 until xs.length).map(t => ref(xs.slice(t - 7, t + 1)))
      // bit equality, not tolerance: identical IEEE op sequences
      got.map(java.lang.Double.doubleToLongBits) ==
        expected.map(java.lang.Double.doubleToLongBits)
    }

  /** Reference edit distance (classic DP) — independent of both Spark
    * and the join under test. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // --- cosine algebra on generated vectors ---

  private val genVecPair: Gen[(List[Double], List[Double])] = for {
    a <- Gen.listOfN(16, Gen.choose(-5.0, 5.0)).suchThat(_.exists(_ != 0.0))
    b <- Gen.listOfN(16, Gen.choose(-5.0, 5.0)).suchThat(_.exists(_ != 0.0))
  } yield (a, b)

  // --- blocked pair join: exact pair coverage for arbitrary n, B ---

  property("blockedScoredPairs covers each unordered pair exactly once, any n/B") =
    forAll(Gen.choose(2, 25), Gen.choose(1, 7),
        Gen.listOfN(25, Gen.listOfN(4, Gen.choose(-3.0, 3.0))
          .suchThat(_.exists(_ != 0.0)))) { (n, nBlocks, vs) =>
      import spark.implicits._
      val rows = vs.take(n).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val e = rows.toDF("vec_id", "v")
      val got = graft.operators.Similarity.blockedScoredPairs(e, nBlocks)
        .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1)))
      val expected = (for { i <- 0 until n; j <- i + 1 until n }
        yield (i.toLong, j.toLong)).toSet
      got.length == expected.size && got.toSet == expected
    }

  property("cosine_sim symmetric, in [-1,1], scale-invariant") =
    forAll(genVecPair) { case (a, b) =>
      import spark.implicits._
      val df = Seq((a, b)).toDF("a", "b")
        .withColumn("ab", call_function("cosine_sim", col("a"), col("b")))
        .withColumn("ba", call_function("cosine_sim", col("b"), col("a")))
        .withColumn("scaled", call_function("cosine_sim",
          transform(col("a"), x => x * 2.0), col("b")))
      val r = df.collect()(0)
      val (ab, ba, sc) = (r.getAs[Double]("ab"), r.getAs[Double]("ba"), r.getAs[Double]("scaled"))
      ab == ba && ab >= -1.0000001 && ab <= 1.0000001 && math.abs(ab - sc) < 1e-9
    }
}
