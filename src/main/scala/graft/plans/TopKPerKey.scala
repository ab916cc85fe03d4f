package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator top-k-per-key, the custom `LogicalPlan` + `Strategy` +
  * `SparkPlan` path (SURVEY.md §7.3 preference (c)).
  *
  * The composable formulation — `row_number().over(partitionBy(key).orderBy
  * (ord))` then `filter(rn <= k)` — sorts EVERY key group in full before
  * discarding all but k rows. This operator keeps a bounded heap per key
  * instead: a partial pass caps every (partition, key) at k rows before the
  * shuffle (map-side combine for top-k), the final pass merges after
  * clustering by key. Shuffle volume is ≤ k rows per (partition, key) — at
  * 100 TB that's the difference between shuffling the fact table and
  * shuffling k·|keys| rows.
  *
  * Ordering must totally order rows (include tiebreak columns) for
  * deterministic results.
  */
final case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partialExec = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partialExec, partial = false) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // Empty keys = global top-k: ClusteredDistribution(Nil) is illegal, but
    // AllTuples (single partition) gives the right final-merge semantics —
    // the partial pass has already capped every input partition at k rows.
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val orderExprs = order
    val childOutput = child.output
    val limit = k
    // Bounded partial state: the partial pass creates at most `maxKeys` live
    // heaps per task. When a row for key number maxKeys+1 arrives, the cap
    // set FREEZES: rows for already-capped keys keep folding into their
    // heaps, rows for unseen keys pass through to the shuffle uncapped — the
    // same graceful degradation as Spark's partial hash aggregation, with
    // zero extra state for the overflow path (the final pass re-merges, so
    // only the cap's effectiveness degrades, never correctness). Without a
    // cap, partial state is O(distinct keys × k) per task — an OOM risk on
    // high-cardinality keys. The final pass holds exactly its output, as any
    // hash aggregation must.
    val maxKeys =
      if (partial)
        org.apache.spark.sql.internal.SQLConf.get
          .getConfString("spark.graft.topk.maxPartialKeys", "65536").toInt
      else Int.MaxValue
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val cmp = org.apache.spark.sql.catalyst.expressions.RowOrdering
        .create(orderExprs, childOutput)
      // max-heap under the sort order: root = worst of the kept k
      val heapCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      def insert(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
        if (heap.size() < limit) heap.add(row.copy())
        else if (cmp.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      // Eager tight loop (the hot path — runs to input exhaustion unless the
      // key cap trips). Kept as a plain while-over-the-partition: hoisting it
      // into a lazily-pumped iterator measured ~2.5x slower end-to-end.
      var overflow: InternalRow = null
      while (overflow == null && rows.hasNext) {
        val row = rows.next()
        val key = keyProj(row)
        val heap = heaps.get(key)
        if (heap != null) insert(heap, row)
        else if (heaps.size() < maxKeys) {
          val h = new java.util.PriorityQueue[InternalRow](limit + 1, heapCmp)
          heaps.put(key.copy(), h)
          insert(h, row)
        } else overflow = row.copy() // cap hit: freeze the cap set
      }
      import scala.jdk.CollectionConverters._
      def drain: Iterator[InternalRow] =
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      if (overflow == null) drain
      else {
        // Degraded tail: capped keys keep folding, unseen keys pass through
        // row-by-row (no copies — the shuffle writer serializes each row
        // before pulling the next). `++` is by-name, so the heap drain runs
        // only after the input is exhausted.
        val rest = rows.flatMap { row =>
          val heap = heaps.get(keyProj(row))
          if (heap != null) { insert(heap, row); None } else Some(row)
        }
        Iterator.single(overflow) ++ rest ++ drain
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** User-facing API. Requires [[graft.functions.GraftExtensions]] (or
  * [[TopK.install]]) so the planner knows the node. */
object TopK {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    }

  /** Sort key: column name + direction (include tiebreaks for determinism). */
  final case class Sort(colName: String, desc: Boolean = false)

  /** Top `k` rows per distinct value of `keys`, first under `order`.
    * Names resolve against the frame's analyzed output, so the node is built
    * fully resolved from pure catalyst attributes (no Column-node baggage in
    * the executed closure). */
  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Sort], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val node = TopKPerKey(
      keys.map(attr),
      order.map { s =>
        SortOrder(attr(s.colName),
          if (s.desc) org.apache.spark.sql.catalyst.expressions.Descending
          else org.apache.spark.sql.catalyst.expressions.Ascending)
      },
      k, analyzed)
    ColumnBridge.ofRows(spark, node)
  }
}
