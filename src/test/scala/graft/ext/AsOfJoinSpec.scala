package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Backward as-of join: inclusive at equal times, per-key, inner semantics,
  * and equal to a brute-force reference on random data. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def asOf(l: Seq[(Long, Long, String)], r: Seq[(Long, Long, String)]) = {
    val left = l.toDF("k", "t", "lv")
    val right = r.toDF("rk", "rt", "rv")
    AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"))
      .select("k", "t", "lv", "rv").as[(Long, Long, String, String)].collect().toSet
  }

  test("picks the latest right row at or before each left time, per key") {
    val got = asOf(
      l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c")),
      r = Seq((1L, 5L, "r5"), (1L, 15L, "r15"), (1L, 25L, "r25"), (2L, 10L, "r10")))
    assert(got === Set(
      (1L, 10L, "a", "r5"),   // 15 and 25 are in the future
      (1L, 20L, "b", "r15"),
      (2L, 10L, "c", "r10"))) // equal time matches (inclusive)
  }

  test("inner semantics: left rows before any right row drop; keys don't leak") {
    val got = asOf(
      l = Seq((1L, 3L, "early"), (3L, 10L, "nokey")),
      r = Seq((1L, 5L, "r5"), (2L, 1L, "other")))
    assert(got === Set.empty)
  }

  test("matches a brute-force window-max reference on random data") {
    val rnd = new scala.util.Random(7)
    val left = (0 until 400).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"l$i"))
    // unique (key, time) on the right: keep one value per pair
    val right = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"r$i"))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val expect = left.flatMap { case (k, t, lv) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      if (cands.isEmpty) None else Some((k, t, lv, cands.maxBy(_._2)._3))
    }.toSet
    assert(asOf(left, right) === expect)
  }

  test("left-outer keeps unmatched left rows with null right columns") {
    val left = Seq((1L, 3L, "early"), (1L, 10L, "late")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "r5")).toDF("rk", "rt", "rv")
    val got = AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"),
        leftOuter = true)
      .select("k", "t", "lv", "rv").as[(Long, Long, String, Option[String])].collect().toSet
    assert(got === Set((1L, 3L, "early", None), (1L, 10L, "late", Some("r5"))))
  }

  test("tolerance turns stale matches into non-matches") {
    val left = Seq((1L, 10L, "fresh"), (1L, 100L, "stale")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "r5")).toDF("rk", "rt", "rv")
    val inner = AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"),
        tolerance = Some(10L))
      .select("lv", "rv").as[(String, String)].collect().toSet
    assert(inner === Set(("fresh", "r5"))) // 100-5=95 > 10 → dropped
    val outer = AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"),
        leftOuter = true, tolerance = Some(10L))
      .select("lv", "rv").as[(String, Option[String])].collect().toSet
    assert(outer === Set(("fresh", Some("r5")), ("stale", None)))
  }

  test("forward as-of picks the nearest right row at or AFTER each left time") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "late")).toDF("k", "t", "lv")
    val right = Seq((1L, 15L, "r15"), (1L, 20L, "r20"), (1L, 25L, "r25")).toDF("rk", "rt", "rv")
    val got = AsOfJoin.asOfForward(left, right, col("k"), col("rk"), col("t"), col("rt"))
      .select("t", "lv", "rv").as[(Long, String, String)].collect().toSet
    assert(got === Set(
      (10L, "a", "r15"),
      (20L, "b", "r20"))) // equal time matches; t=30 has no future right row
    // tolerance bounds the forward gap
    val tight = AsOfJoin.asOfForward(left, right, col("k"), col("rk"), col("t"), col("rt"),
        tolerance = Some(3L))
      .select("t", "rv").as[(Long, String)].collect().toSet
    assert(tight === Set((20L, "r20"))) // 15-10=5 > 3 dropped
  }

  test("forward as-of matches brute force on random data") {
    val rnd = new scala.util.Random(13)
    val left = (0 until 300).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"l$i"))
    val right = (0 until 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"r$i"))
      .groupBy(x => (x._1, x._2)).map(_._2.maxBy(_._3)).toSeq
    val expect = left.flatMap { case (k, t, lv) =>
      val cands = right.filter(r => r._1 == k && r._2 >= t)
      if (cands.isEmpty) None else Some((k, t, lv, cands.minBy(_._2)._3))
    }.toSet
    val got = AsOfJoin.asOfForward(left.toDF("k", "t", "lv"), right.toDF("rk", "rt", "rv"),
        col("k"), col("rk"), col("t"), col("rt"))
      .select("k", "t", "lv", "rv").as[(Long, Long, String, String)].collect().toSet
    assert(got === expect)
  }

  test("plans one shuffle (window exchange), not a nested-loop join") {
    val left = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val right = Seq((1L, 5L, "r")).toDF("rk", "rt", "rv")
    val plan = AsOfJoin.asOf(left, right, col("k"), col("rk"), col("t"), col("rt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
