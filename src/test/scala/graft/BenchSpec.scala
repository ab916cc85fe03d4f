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
}
