package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Band join via bucket-equi-join + refine: correct on boundaries and
  * overlaps, and never plans a nested-loop. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val intervals = Seq(
    (10, 0.0, 10.0), (20, 10.0, 20.0),
    (90, 5.0, 15.0), // overlaps both
  ).toDF("iid", "lo", "hi")

  private def join(points: Seq[(Long, Double)], width: Double) =
    RangeJoin.pointInInterval(points.toDF("pid", "x"), intervals,
        col("x"), col("lo"), col("hi"), width)
      .select("pid", "iid").as[(Long, Int)].collect().toSet

  test("half-open [lo, hi) semantics incl. exact boundaries, overlap fan-out") {
    val got = join(Seq((1L, 0.0), (2L, 9.99), (3L, 10.0), (4L, 5.0), (5L, 20.0), (6L, -1.0)), 10.0)
    assert(got === Set(
      (1L, 10),           // lo inclusive
      (2L, 10), (2L, 90),
      (3L, 20), (3L, 90), // hi exclusive for iid=10
      (4L, 10), (4L, 90), // overlap: two matches
      // 5: 20.0 excluded from [10,20); 6: below every interval
    ))
  }

  test("bucket width does not change results (only the fan-out)") {
    val pts = (0 until 200).map(i => (i.toLong, i * 0.11))
    assert(join(pts, 1.0) === join(pts, 10.0))
    assert(join(pts, 1.0) === join(pts, 25.0))
  }

  test("plans a hash equi-join on bucket id, not a nested-loop") {
    val plan = RangeJoin.pointInInterval(
        Seq((1L, 3.0)).toDF("pid", "x"), intervals,
        col("x"), col("lo"), col("hi"), 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
