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
    * backward as-of; ties at equal time match). Inner semantics: left rows
    * with no prior right row are dropped.
    *
    * Output columns: all of `left`'s, then all of `right`'s — the two column
    * sets must be disjoint (rename before calling). If `right` can hold
    * several rows at the same (key, time), dedupe it first (e.g. keep the max
    * payload id) — the as-of "latest" row is otherwise ambiguous in ANY
    * engine, DuckDB's ASOF JOIN included.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
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

    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__match", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(lCols.map(c => col(s"__lrow.$c")) ++ rCols.map(c => col(s"__match.$c")): _*)
  }
}
