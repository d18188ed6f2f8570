package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The bench harness itself is part of the round contract (errors must
  * surface, floors must trigger bounded re-runs), so it gets a spec. */
class BenchSpec extends SparkSpec {

  private def fast(s: SparkSession, dir: String): DataFrame =
    s.range(10).toDF("id")

  test("a poisoned registry entry lands in errors, never a silent time") {
    val poisoned: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "k_ok" -> fast,
      // filter, not select: a count() prunes an unreferenced projection
      // without ever evaluating it, which is exactly how a broken key
      // could hide — the filter must evaluate per row
      "k_poison" -> ((s, _) =>
        s.range(1).toDF("id").filter(expr("assert_true(id > 99, 'boom') is null"))))
    val rs = Bench.measure(spark, sf, poisoned, floors = Map.empty)
    assert(rs.map(_.name) === Seq("k_ok", "k_poison"))
    assert(rs.head.error.isEmpty)
    val err = rs(1).error
    assert(err.isDefined, "throwing key must record an error")
    // a deterministic throw must not be retried into a triple
    assert(rs(1).times.size === 1)
    val line = Bench.jsonLine(Map("k_ok" -> 0.1), 0.2, 2, sf, 0.3,
      errors = Seq("k_poison"), reruns = 0, flagged = Seq.empty)
    assert(line.contains(""""errors":["k_poison"]"""), line)
  }

  test("a run past 3x its recorded floor re-runs to median-of-3; in-band runs do not") {
    val slow: (SparkSession, String) => DataFrame =
      (s, _) => { Thread.sleep(700); s.range(1).toDF("id") }
    // floor 0.01 -> threshold 0.53 s; the 0.7 s run must re-run
    val rs = Bench.measure(spark, sf, Seq("k_slow" -> slow), Map("k_slow" -> 0.01))
    assert(rs.head.times.size === 3, s"expected median-of-3, got ${rs.head.times}")
    assert(rs.head.median >= 0.7)
    // same run with an honest floor: single measurement
    val rs2 = Bench.measure(spark, sf, Seq("k_slow" -> slow), Map("k_slow" -> 0.7))
    assert(rs2.head.times.size === 1)
    // no recorded floor: nothing to compare against, single measurement
    val rs3 = Bench.measure(spark, sf, Seq("k_slow" -> slow), Map.empty)
    assert(rs3.head.times.size === 1)
  }

  test("a first-inflated-then-quiet key clears its flag at late adjudication; sustained inflation keeps it") {
    // transient: every sweep run sleeps (inflated median), the late
    // re-measure is instant — models an external-load window that has
    // passed by end-of-run
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val transient: (SparkSession, String) => DataFrame =
      (s, _) => { if (calls.incrementAndGet() <= 3) Thread.sleep(700); s.range(1).toDF("id") }
    val floors = Map("k_trans" -> 0.01) // threshold 0.53 s
    val swept = Bench.measure(spark, sf, Seq("k_trans" -> transient), floors)
    assert(swept.head.median >= 0.7, "sweep runs must all be inflated")
    val adj = Bench.adjudicate(spark, sf, Map("k_trans" -> transient), floors, swept)
    assert(adj.head.times.size === 3, "late re-measure is median-of-3, not one warm run")
    assert(adj.head.median <= Bench.threshold(0.01), s"record must be the quiet time, got ${adj.head.median}")
    assert(adj.head.sweepMedian.exists(_ >= 0.7), "discarded sweep median stays on the record")
    // ...and ships in the sidecar next to the late value
    val line = Bench.jsonLine(Map.empty, 0.0, 1, sf, 0.1, Seq.empty, 0, Seq.empty,
      adjudicated = Map("k_trans" -> (adj.head.sweepMedian.get, adj.head.median)))
    assert(line.contains(""""adjudicated":{"k_trans":{"sweep":"""), line)

    // sustained: still slow at the tail — flag (i.e. the inflated median) stands
    val sustained: (SparkSession, String) => DataFrame =
      (s, _) => { Thread.sleep(700); s.range(1).toDF("id") }
    val swept2 = Bench.measure(spark, sf, Seq("k_sust" -> sustained), Map("k_sust" -> 0.01))
    val adj2 = Bench.adjudicate(spark, sf, Map("k_sust" -> sustained), Map("k_sust" -> 0.01), swept2)
    assert(adj2.head.median >= 0.7, "sustained inflation is never averaged away")
    assert(adj2.head.times === swept2.head.times, "original result stands")

    // in-band keys are untouched (no extra run spent on them)
    val quick = Bench.measure(spark, sf, Seq("k_ok" -> fast), Map("k_ok" -> 5.0))
    assert(Bench.adjudicate(spark, sf, Map("k_ok" -> fast), Map("k_ok" -> 5.0), quick) === quick)
  }

  test("error strings with quotes/backslashes stay valid JSON in the sidecar") {
    val line = Bench.jsonLine(Map.empty, 0.0, 1, sf, 0.1,
      errors = Seq("""k_bad: [UNRESOLVED_COLUMN] A column "na\me" cannot be resolved"""),
      reruns = 0, flagged = Seq.empty)
    assert(line.contains("""k_bad: [UNRESOLVED_COLUMN] A column \"na\\me\" cannot be resolved"""), line)
    // the whole line must parse as JSON: quote balance check via Spark's parser
    val parsed = spark.range(1).selectExpr(
      s"get_json_object('${line.replace("\\", "\\\\").replace("'", "\\'")}', '$$.errors') as e")
      .collect().head.getString(0)
    assert(parsed != null, s"jsonLine must stay machine-parseable, got: $line")
  }

  test("steal parser reads field 8 of the aggregate cpu line") {
    // user nice system idle iowait irq softirq STEAL guest guest_nice
    assert(Bench.parseStealTicks("cpu  10 0 10 60 0 0 0 20 0 0") === ((20L, 100L)))
    assert(Bench.parseStealTicks("cpu 1 2 3 4") === ((0L, 10L))) // old kernels: no steal field
  }

  test("floors file round-trips and keeps the monotone min") {
    val p = Files.createTempDirectory("graft_bench_spec").resolve("floors.json")
    Bench.saveFloors(p, Map("a" -> 1.25, "b" -> 0.031))
    assert(Bench.loadFloors(p) === Map("a" -> 1.25, "b" -> 0.031))
    assert(Bench.loadFloors(p.resolveSibling("missing.json")) === Map.empty)
    // persisted floors round DOWN: half-up would store 0.0006 as 0.001,
    // strictly above the observed best (then re-amplified 3x by threshold)
    Bench.saveFloors(p, Map("c" -> 0.0006))
    assert(Bench.loadFloors(p)("c") === 0.0)
  }
}
