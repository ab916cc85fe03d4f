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
}
