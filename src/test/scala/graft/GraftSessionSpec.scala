package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftSession: engine defaults land in the session and the extensions are
  * live (functions callable, TopK strategy injected). Uses its own session
  * app name; getOrCreate reuses the shared test SparkContext. */
class GraftSessionSpec extends AnyFunSuite {

  test("defaults + extensions are active in a GraftSession") {
    // Force the shared context first so getOrCreate attaches to it rather
    // than binding a second SparkContext.
    val shared = SparkSpec.spark
    // getOrCreate RETURNS the active session with this builder's confs
    // applied to it — snapshot what we touch and restore after, so the
    // shared test session keeps its own settings for other suites.
    val touched = Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone",
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.files.maxPartitionBytes", "spark.sql.legacy.parquet.nanosAsLong")
    val before = touched.map(k => k -> shared.conf.getOption(k)).toMap
    val s = GraftSession.builder("graft-session-spec", 4)
      .master("local[4]").getOrCreate()
    try {
      // session-level confs apply even on the shared context
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      assert(s.conf.get("spark.sql.shuffle.partitions") === "8")
      // extensions: registered function + planner strategy usable end-to-end
      graft.functions.GraftFunctions.register(s)
      val one = s.sql(
        """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c""")
        .collect().head.getDouble(0)
      assert(math.abs(one - 1.0) < 1e-12)
    } finally before.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
