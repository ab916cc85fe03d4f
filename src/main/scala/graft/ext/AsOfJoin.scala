package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series join the reference's consumers would
  * run against its Cassandra serving table (latest state at or before a
  * lookup time; reference layout `db-script.cql:37-38` clusters by
  * `eventtime DESC` for exactly this access pattern), expressed as a single
  * distributed Spark plan.
  *
  * Spark-first shape: instead of a per-key loop or a range self-join (which
  * Spark would plan as a nested-loop), both sides are UNIONed with a side
  * marker and sorted once per key on (time, side); a running
  * `last(right_payload, ignoreNulls)` window then carries the most recent
  * right row forward onto every left row. Cost at any scale: ONE shuffle on
  * the key + a linear in-partition sort-scan — no fan-out, no quadratic
  * candidate pairs, and skew behaves exactly like any other window (salt the
  * key upstream if one key dominates).
  */
object AsOfJoin {

  /** For each `left` row, attach the single `right` row with the greatest
    * `rightTime <= leftTime` among rows sharing the join key (inclusive
    * backward as-of; ties at equal time match).
    *
    * `leftOuter = false` (default) drops left rows with no prior right row;
    * `true` keeps them with null right columns. `tolerance` (in the time
    * column's `cast("long")` units — seconds for timestamps) additionally
    * requires `leftTime - rightTime <= tolerance`, turning stale matches
    * into non-matches — the standard "join to recent state only" guard.
    *
    * Output columns: all of `left`'s, then all of `right`'s — the two column
    * sets must be disjoint (rename before calling). If `right` can hold
    * several rows at the same (key, time), dedupe it first (e.g. keep the max
    * payload id) — the as-of "latest" row is otherwise ambiguous in ANY
    * engine, DuckDB's ASOF JOIN included.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftOuter: Boolean = false, tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      leftOuter, tolerance, forward = false)

  /** Forward as-of: the single right row with the SMALLEST
    * `rightTime >= leftTime` per key (nearest event AFTER; e.g. "the next
    * order following each click"). Same plan shape as the backward join —
    * the union sorts descending instead, so the running `last` carries the
    * nearest FUTURE right row backward onto each left row. `tolerance`
    * bounds `rightTime - leftTime`. */
  def asOfForward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftOuter: Boolean = false, tolerance: Option[Long] = None): DataFrame =
    asOfImpl(left, right, leftKey, rightKey, leftTime, rightTime,
      leftOuter, tolerance, forward = true)

  private def asOfImpl(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      leftOuter: Boolean, tolerance: Option[Long], forward: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"left/right column names must be disjoint, both have: ${lCols.intersect(rCols).mkString(", ")}")

    val rStructType = right.select(struct(rCols.map(col): _*)).schema.head.dataType
    // Right rows sort BEFORE left rows at equal time (side 0 < 1), which is
    // what makes the as-of inclusive.
    val l2 = left.select(
      leftKey.as("__k"), leftTime.as("__t"), lit(1).as("__side"),
      struct(lCols.map(col): _*).as("__lrow"),
      lit(null).cast(rStructType).as("__rrow"))
    val r2 = right.select(
      rightKey.as("__k"), rightTime.as("__t"), lit(0).as("__side"),
      lit(null).cast(l2.schema("__lrow").dataType).as("__lrow"),
      struct(rCols.map(col): _*).as("__rrow"))

    // Backward: ascending time, rights before lefts at ties, running `last`
    // carries the most recent PAST right row forward. Forward: descending
    // time (rights still first at ties), so the same running `last` carries
    // the nearest FUTURE right row backward.
    val w = (if (forward)
        Window.partitionBy("__k").orderBy(col("__t").desc, col("__side"))
      else Window.partitionBy("__k").orderBy(col("__t"), col("__side")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Both window aggregates share one spec → Spark evaluates them in a
    // single Window operator over the same sort.
    val carried = l2.unionByName(r2)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .withColumn("__mt", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    val gap =
      if (forward) col("__mt").cast("long") - col("__t").cast("long")
      else col("__t").cast("long") - col("__mt").cast("long")
    val fresh = tolerance match {
      case Some(tol) => col("__match").isNotNull && gap <= tol
      case None => col("__match").isNotNull
    }
    val lefts = carried.filter(col("__side") === 1)
      .withColumn("__eff", when(fresh, col("__match")))
    (if (leftOuter) lefts else lefts.filter(col("__eff").isNotNull))
      .select(lCols.map(c => col(s"__lrow.$c")) ++ rCols.map(c => col(s"__eff.$c")): _*)
  }
}
