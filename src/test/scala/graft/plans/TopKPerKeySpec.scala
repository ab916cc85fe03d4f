package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Custom top-k-per-key operator: result parity with the window formulation,
  * partial/final plan shape, bounded shuffle. */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  lazy val orders = graft.queries.Tables.orders(spark, "/root/testdata/sf0.001").cache()

  def windowTop3 = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).drop("rn")
  }

  def customTop3 = TopK.perKey(orders,
    keys = Seq("o_custkey"),
    order = Seq(TopK.Sort("o_totalprice", desc = true), TopK.Sort("o_orderkey")), k = 3)

  test("matches the window row_number formulation exactly") {
    val a = customTop3.orderBy("o_custkey", "o_orderkey").collect().toSeq
    val b = windowTop3.orderBy("o_custkey", "o_orderkey").collect().toSeq
    assert(a === b)
  }

  test("plans as partial + final TopKPerKeyExec around one exchange") {
    val plan = customTop3.queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(plan).length === 2, plan) // partial + final
    assert(plan.contains(", true")  // partial flag before the exchange
      && plan.contains(", false"))  // final flag after
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("handles k larger than group sizes and single-row groups") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val out = TopK.perKey(df, Seq("k"), Seq(TopK.Sort("v", desc = true)), k = 5)
      .orderBy("k", "v").as[(Int, Int)].collect().toSeq
    assert(out === Seq((1, 10), (1, 20), (2, 5)))
  }

  test("partial-state cap (frozen cap set + passthrough) does not change results") {
    // Cap the partial pass at 4 live heaps with ~150 distinct keys: the cap
    // set freezes on key 5 and every unseen key passes through uncapped; the
    // final merge must still produce exactly the window-formulation result.
    val prev = spark.conf.getOption("spark.graft.topk.maxPartialKeys")
    try {
      spark.conf.set("spark.graft.topk.maxPartialKeys", "4")
      val a = customTop3.orderBy("o_custkey", "o_orderkey").collect().toSeq
      val b = windowTop3.orderBy("o_custkey", "o_orderkey").collect().toSeq
      assert(a === b)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.topk.maxPartialKeys", v)
        case None => spark.conf.unset("spark.graft.topk.maxPartialKeys")
      }
    }
  }

  test("ties at the boundary are broken by the tiebreak column") {
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 10, "c"), (1, 5, "d")).toDF("k", "v", "t")
    val out = TopK.perKey(df, Seq("k"), Seq(TopK.Sort("v", desc = true), TopK.Sort("t")), k = 2)
      .select("t").as[String].collect().sorted.toSeq
    assert(out === Seq("a", "b"))
  }
}
