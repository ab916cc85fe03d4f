package graft

import graft.SparkSpec

/** Bench must surface query failures as explicit error markers, never as
  * plausible durations (round-3 VERDICT item 3). */
class BenchSpec extends SparkSpec {

  test("a crashing query records an error marker, not a timing") {
    val boom = (_: org.apache.spark.sql.SparkSession, _: String) =>
      throw new IllegalStateException("deliberately broken")
    val ok = (s: org.apache.spark.sql.SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("id")
    }
    val results = Seq(
      "broken_query" -> Bench.timeQuery(spark, "/unused", boom),
      "healthy_query" -> Bench.timeQuery(spark, "/unused", ok))
    val broken = results.head._2
    assert(broken.seconds.isEmpty)
    assert(broken.error.exists(_.contains("deliberately broken")))
    val healthy = results(1)._2
    assert(healthy.seconds.exists(_ > 0) && healthy.error.isEmpty)

    val json = Bench.renderJson(results, "/root/testdata/sf0.1")
    // the failed query appears with the impossible -1 sentinel AND a message
    assert(json.contains("\"broken_query\":-1"))
    assert(json.contains("\"errors\":{\"broken_query\":"))
    assert(json.contains("deliberately broken"))
    // total sums only successful queries
    assert(!json.contains("\"value\":-1"))
    // healthy runs keep the original shape: no errors object at all
    val clean = Bench.renderJson(results.drop(1), "/root/testdata/sf0.1")
    assert(!clean.contains("errors"))
  }

  test("operator split appears as a sibling object and never inflates the total") {
    val ok = (s: org.apache.spark.sql.SparkSession, _: String) => {
      import s.implicits._
      Seq(1, 2, 3).toDF("id")
    }
    val results = Seq("q_prop" -> Bench.timeQuery(spark, "/unused", ok))
    val operators = Seq("q_prop" -> Bench.timeQuery(spark, "/unused", ok))
    val json = Bench.renderJson(results, "/root/testdata/sf0.1", operators)
    assert(json.contains("\"operator\":{\"q_prop\":"))
    // total still sums the FULL queries only (operator numbers are a split,
    // not extra work)
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(json).get.group(1).toDouble
    assert(math.abs(total - results.head._2.seconds.get) < 1e-9)
    // every operator key must mirror a full query of the same name
    assert(SparkEntry.operatorQueries.keySet.subsetOf(SparkEntry.queries.keySet))
    // a crashing operator twin surfaces as a namespaced error marker
    val boom = (_: org.apache.spark.sql.SparkSession, _: String) =>
      throw new IllegalStateException("twin broke")
    val j2 = Bench.renderJson(results, "/root/testdata/sf0.1",
      Seq("q_prop" -> Bench.timeQuery(spark, "/unused", boom)))
    assert(j2.contains("\"operator\":{\"q_prop\":-1"))
    assert(j2.contains("\"errors\":{\"operator:q_prop\":"))
  }

  test("cross-run medians aggregate per query over the history file") {
    val hist = java.nio.file.Files.createTempDirectory("graft_bench")
      .resolve("hist.jsonl").toString
    def t(sec: Double) = Bench.Timing(Some(sec), None)
    // three runs with a drifty q1 and a stable q2; q3 fails in run 2
    val (m1, r1, _) = Bench.crossRunMedians(hist, "sfX",
      Seq("q1" -> t(1.0), "q2" -> t(0.5), "q3" -> t(2.0)))
    assert(r1 === 1 && m1("q1") === 1.0)
    val (m2, r2, _) = Bench.crossRunMedians(hist, "sfX",
      Seq("q1" -> t(9.0), "q2" -> t(0.5), "q3" -> Bench.Timing(None, Some("boom"))))
    assert(r2 === 2)
    // a query that ERRORED this run keeps its historical median — the
    // failure is loud in n_errors, and dropping it would shrink
    // median_value into a fake improvement
    assert(m2("q3") === 2.0)
    val (m3, r3, minRuns3) = Bench.crossRunMedians(hist, "sfX",
      Seq("q1" -> t(1.2), "q2" -> t(0.6), "q3" -> t(2.2)))
    assert(r3 === 3)
    // median discards the 9.0 spike; failed run contributes nothing for q3
    assert(m3("q1") === 1.2)
    assert(m3("q2") === 0.5)
    assert(m3("q3") === 2.2)
    // q3 has only 2 recorded samples (its run-2 failure recorded nothing):
    // the min-series length exposes that `runs` overclaims its sample
    assert(minRuns3 === 2)
    // a different sf shares the file without cross-talk
    val (mY, rY, _) = Bench.crossRunMedians(hist, "sfY", Seq("q1" -> t(100.0)))
    assert(rY === 1 && mY("q1") === 100.0)
    // and the rendered line carries the cross-run fields
    val json = Bench.renderJson(Seq("q1" -> t(1.2)), "sfX", Nil, m3, r3, minRuns3)
    assert(json.contains("\"runs\":3"))
    assert(json.contains("\"median_min_runs\":2"))
    assert(json.contains("\"median_queries\":{"))
    assert(json.contains("\"median_value\":"))
  }

  test("medians are restricted to the current run's query set (like-for-like)") {
    val hist = java.nio.file.Files.createTempDirectory("graft_bench2")
      .resolve("hist.jsonl").toString
    def t(sec: Double) = Bench.Timing(Some(sec), None)
    // two historical runs carry q_old; the current run renamed it to q_new
    Bench.crossRunMedians(hist, "sfX", Seq("q_old" -> t(5.0), "q_keep" -> t(1.0)))
    Bench.crossRunMedians(hist, "sfX", Seq("q_old" -> t(5.0), "q_keep" -> t(1.0)))
    val (m, runs, minRuns) = Bench.crossRunMedians(hist, "sfX",
      Seq("q_new" -> t(2.0), "q_keep" -> t(1.0)))
    assert(runs === 3)
    // the removed query's stale history no longer leaks into the medians
    assert(!m.contains("q_old"))
    assert(m("q_keep") === 1.0)
    // the new query's median exists but over a 1-run series — surfaced via
    // the min-series length, not silently blended into `runs`
    assert(m("q_new") === 2.0)
    assert(minRuns === 1)
    assert(math.abs(m.values.sum - 3.0) < 1e-9)
  }
}
