package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (band) join. Spark plans a bare
  * `p.x >= i.lo AND p.x < i.hi` join as a (broadcast) nested-loop —
  * O(points × intervals) comparisons, fatal when the interval side outgrows
  * a broadcast. This operator turns it into an EQUI-join Catalyst can hash:
  * points bucket by `floor(x / width)`, each interval explodes to the bucket
  * range it covers, the bucket ids hash-join (shuffle- or broadcast-hash as
  * sizes dictate), and the exact predicate refines survivors.
  *
  * At 100 TB: one shuffle on bucket id for both sides (or none, when the
  * exploded interval side still broadcasts); per-row fan-out is bounded by
  * `intervalWidth / bucketWidth`, so pick `bucketWidth` near the typical
  * interval width to keep the blow-up ~constant. Overlapping intervals are
  * fine — a point matches every interval containing it.
  */
object RangeJoin {

  /** Join each `points` row to every `intervals` row whose half-open
    * `[lo, hi)` contains `point`. Output: all point columns, then all
    * interval columns (names must be disjoint). `bucketWidth` trades
    * interval fan-out (≈ width/bucketWidth buckets per interval) against
    * bucket selectivity (false candidates refined away). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column, bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pCols = points.columns.toSeq
    val iCols = intervals.columns.toSeq
    require(pCols.intersect(iCols).isEmpty,
      s"point/interval column names must be disjoint, both have: ${pCols.intersect(iCols).mkString(", ")}")

    val p2 = points.withColumn("__pb", floor(point / lit(bucketWidth)).cast("long"))
    // Degenerate/inverted intervals (hi <= lo) match nothing under [lo, hi),
    // but sequence(start, stop) with start > stop generates a DESCENDING
    // range — one corrupt (lo=1e9, hi=0) row would explode into millions of
    // bucket rows before the refine drops them. Filter them out up front.
    // floor(hi/width) (not hi-epsilon) may add one empty boundary bucket when
    // hi sits exactly on a bucket edge — harmless, the refine drops it.
    val i2 = intervals.filter(hi > lo).withColumn("__ib",
      explode(sequence(floor(lo / lit(bucketWidth)).cast("long"),
        floor(hi / lit(bucketWidth)).cast("long"))))
    p2.join(i2, p2("__pb") === i2("__ib") && point >= lo && point < hi)
      .select(pCols.map(col) ++ iCols.map(col): _*)
  }
}
