package graft.tx

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental view maintenance from the change feed — the APPLY side of
  * the CDC triangle ([[CommitLog.changeFeed]] read, mutations write,
  * this folds). Keyed COUNT/SUM/AVG aggregates are maintained WITHOUT
  * re-scanning the base table: every change row carries a sign (+1 for
  * `insert`/`update_postimage`, −1 for `delete`/`update_preimage`), the
  * slice folds to one small delta per key, and the delta merges into the
  * aggregate table file-granularly — so maintaining a per-key rollup of a
  * 100 TB base costs O(changed keys), the whole point of a change feed.
  * An update that MOVES a row between groups is handled for free: its
  * pre-image decrements the old group, its post-image increments the new.
  * (MIN/MAX are deliberately absent: they are not incrementally
  * maintainable under deletes without keeping per-group row state.)
  */
object ChangeApply {

  /** Fold a change-feed slice into `aggTable` (schema: `keys…, n`).
    * Returns the aggregate table's new latest version (unchanged when the
    * slice nets to zero). Zero-count groups are deleted from the
    * aggregate, keeping it minimal. First call may target an empty-seeded
    * table (commit an empty `keys…, n` frame).
    *
    * `txn = Some((appId, batchId))` makes the fold IDEMPOTENT per writer,
    * the same contract as `CommitLog.commit`/`merge`: a replayed slice
    * (restarted foreachBatch consumer) whose batchId is already recorded
    * re-applies NOTHING — without it, a replay double-counts every key in
    * the slice. The watermark lands with the merge; the zero-sweep delete
    * is re-run on replay (idempotent — deleting no rows is a no-op), so a
    * crash between the merge and its sweep still converges. */
  def applyCounts(spark: SparkSession, aggTable: String, feed: DataFrame,
      keys: Seq[String], txn: Option[(String, Long)] = None): Long =
    applyAggregates(spark, aggTable, feed, keys, Nil, txn)

  /** Exact decimal type for maintained sums. DECIMAL, not the value's own
    * float type, because incremental maintenance REQUIRES an associative
    * exact sum: a float fold's result depends on the order deltas arrive,
    * so "maintained == recomputed" would only hold to within drift — and
    * an update's −pre +post pair would leave residue forever. Decimal
    * addition is exact and order-free, so the maintained sum equals a
    * from-scratch recompute bit-for-bit at any slice granularity. */
  val SumType = org.apache.spark.sql.types.DecimalType(38, 6)

  /** [[applyCounts]] generalized to value columns: maintain
    * `keys…, n, sum_<c> DECIMAL(38,6), cnt_<c>` per value column `c` —
    * enough for SUM (NULL when `cnt_<c>` = 0, per SQL), COUNT(c), and
    * AVG (sum/cnt) to be served from the rollup. Per-column non-null
    * counts are maintained separately from `n` because SUM/AVG ignore
    * NULLs while COUNT(*) does not; an update that only changes a value
    * nets `__dn` = 0 but still lands (its −pre/+post sum delta is
    * nonzero). Same idempotency (`txn`), NULL-group-key refusal, and
    * zero-sweep contract as [[applyCounts]] — which is this function
    * with no value columns. */
  def applyAggregates(spark: SparkSession, aggTable: String, feed: DataFrame,
      keys: Seq[String], valueCols: Seq[String],
      txn: Option[(String, Long)] = None): Long = {
    require(keys.nonEmpty, "ChangeApply requires at least one key column")
    def sweepZeros(): Long =
      CommitLog.delete(spark, aggTable, col("n") === 0L)
    txn.foreach { case (app, batch) =>
      if (CommitLog.txnVersion(aggTable, app).exists(_ >= batch))
        return sweepZeros() // already applied; finish a possibly-crashed sweep
    }
    val sign = when(col(CommitLog.ChangeTypeCol)
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    val zeroDec = lit(0).cast(SumType)
    val aggExprs = sum(sign).as("__dn") +: valueCols.flatMap { c => Seq(
      sum(when(col(c).isNotNull, sign.cast(SumType) * col(c).cast(SumType))
        .otherwise(zeroDec)).cast(SumType).as(s"__ds_$c"),
      sum(when(col(c).isNotNull, sign).otherwise(0L)).as(s"__dc_$c"))
    }
    val changed = valueCols.foldLeft(col("__dn") =!= 0L) { (acc, c) =>
      acc || col(s"__dc_$c") =!= 0L || col(s"__ds_$c") =!= zeroDec
    }
    // persisted: the delta (one small row per changed key) is consulted by
    // the NULL probe below AND by several of merge's own passes (dup
    // check, key bounds, probe, rewrite, CDC) — without pinning it, each
    // would re-run the full feed scan + aggregation
    val delta = feed.groupBy(keys.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
      .filter(changed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // NULL group keys are rejected, not folded (round-5 ADVICE, low): a
      // NULL-key delta row can never MATCH in CommitLog.merge (SQL NULL
      // joins nothing), so every applied slice would INSERT a fresh
      // NULL-key row instead of updating the prior one — the rollup would
      // accumulate duplicates the zero-sweep can't reconcile. Callers
      // maintaining a NULL-able dimension must coalesce to a sentinel.
      val nullKeyed = delta.filter(keys.map(col(_).isNull).reduce(_ || _)).limit(1).collect()
      require(nullKeyed.isEmpty,
        s"ChangeApply cannot fold NULL group keys (row ${nullKeyed.headOption.orNull}); " +
          "coalesce the key to a sentinel value in the feed first")
      val current = CommitLog.read(spark, aggTable)
      val outCols = keys.map(col) ++
        ((coalesce(col("n"), lit(0L)) + col("__dn")).as("n") +:
          valueCols.flatMap { c => Seq(
            (coalesce(col(s"sum_$c"), zeroDec) + col(s"__ds_$c"))
              .cast(SumType).as(s"sum_$c"),
            (coalesce(col(s"cnt_$c"), lit(0L)) + col(s"__dc_$c")).as(s"cnt_$c"))
          })
      val merged = delta.join(current, keys, "left_outer").select(outCols: _*)
      if (merged.isEmpty) return CommitLog.latestVersion(aggTable).getOrElse(0L)
      val v = CommitLog.merge(spark, aggTable, merged, keys, txn = txn)
      // groups that netted to zero leave the aggregate entirely
      if (merged.filter(col("n") === 0L).isEmpty) v
      else sweepZeros()
    } finally delta.unpersist(blocking = false): Unit
  }
}
