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
  * clustering by key. State is O(distinct keys × k) per task and shuffle
  * volume is ≤ k rows per (partition, key) — at 100 TB that's the difference
  * between shuffling the fact table and shuffling k·|keys| rows.
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
    // Bounded partial state: the partial pass holds at most `maxKeys` live
    // heaps; when a new key arrives at the cap, one victim heap is spilled
    // straight to output (its key may recur with a fresh heap — the final
    // pass re-merges, so only the cap's EFFECTIVENESS degrades, never
    // correctness). Without this, partial state is O(distinct keys × k) per
    // task — an OOM on high-cardinality keys at scale. The final pass holds
    // exactly its output, as any hash aggregation must.
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
      new scala.collection.AbstractIterator[InternalRow] {
        private val pending = new java.util.ArrayDeque[InternalRow]()
        private var drain: Iterator[InternalRow] = null

        private def pump(): Unit = {
          while (pending.isEmpty && rows.hasNext) {
            val row = rows.next()
            val key = keyProj(row)
            var heap = heaps.get(key)
            if (heap == null) {
              if (heaps.size() >= maxKeys) {
                val it = heaps.entrySet().iterator()
                val victim = it.next()
                it.remove()
                victim.getValue.forEach(r => pending.add(r))
              }
              heap = new java.util.PriorityQueue[InternalRow](limit + 1, heapCmp)
              heaps.put(key.copy(), heap)
            }
            if (heap.size() < limit) heap.add(row.copy())
            else if (cmp.compare(row, heap.peek()) < 0) {
              heap.poll()
              heap.add(row.copy())
            }
          }
          if (pending.isEmpty && !rows.hasNext && drain == null) {
            import scala.jdk.CollectionConverters._
            drain = heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
          }
        }

        override def hasNext: Boolean = {
          pump()
          !pending.isEmpty || (drain != null && drain.hasNext)
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty top-k iterator")
          if (!pending.isEmpty) pending.poll() else drain.next()
        }
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
