package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected optimizer rule: window rank-filter idioms silently plan as
  * TopKPerKey when the rank is dropped, and are left alone when it isn't. */
class RewriteRankFilterSpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = {
    TopK.install(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteRankFilterToTopK)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRankFilterToTopK
    }
    graft.queries.Tables.orders(spark, "/root/testdata/sf0.001").cache()
  }

  val w = Window.partitionBy("o_custkey")
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  test("rank<=k with rank dropped rewrites to TopKPerKey, same results") {
    val q = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window ") && !plan.contains("WindowGroupLimit"), plan)
    val direct = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.Sort("o_totalprice", desc = true), TopK.Sort("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    assert(q.orderBy("o_custkey", "o_orderkey").collect().toSeq ===
      direct.orderBy("o_custkey", "o_orderkey").collect().toSeq)
  }

  test("rn = 1 (latest-revision dedup idiom) rewrites too") {
    val q = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    // one row per customer, the max-price order
    val got = q.as[(Long, Long)].collect().toMap
    val expect = orders.groupBy("o_custkey").agg(count(lit(1))).count()
    assert(got.size === expect)
  }

  test("GLOBAL rank-filter (empty partitionSpec) rewrites and runs (ADVICE r1 high)") {
    // row_number() over (order by ...) with no partitioning — previously
    // planned TopKPerKey(Nil, ...) and threw from ClusteredDistribution(Nil).
    val q = orders.withColumn("rn",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 5)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    val got = q.orderBy(col("o_totalprice").desc, col("o_orderkey")).collect()
    val expect = orders.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_totalprice").limit(5).collect()
    assert(got.toSeq === expect.toSeq)
  }

  test("rank kept in the output: Window input capped by TopKPerKey, identical ranks") {
    // round-16 optimization: the Window survives (rank values are needed)
    // but its input is capped to the per-key top-k by bounded heaps, so the
    // per-key sort ranks ≤ k rows instead of every row in the group.
    val q = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Window"), plan)
    // ranks must equal the uncapped window's (same total order, same rows);
    // the expected frame runs the plain Window with NO rank filter (nothing
    // for the rewrite to match) and filters driver-side
    val expected = orders.withColumn("rn", row_number().over(w))
      .select("o_custkey", "rn", "o_orderkey")
      .collect().filter(_.getInt(1) <= 3)
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    val got = q.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2))
    assert(got.toSeq === expected.toSeq)
  }
}
