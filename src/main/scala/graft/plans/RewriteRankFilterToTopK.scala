package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous ranking-filter idiom
  *
  *   Project [cols without rn]
  *     Filter rn <= k               (or rn < k+1, or rn = 1)
  *       Window [row_number() over (partition by K order by O) as rn]
  *
  * into the whole-operator [[TopKPerKey]] when the rank column itself is
  * projected away. Spark's own `InferWindowGroupLimit` (3.5+) only inserts a
  * pre-filter below the Window — the full per-group sort still runs; this
  * rewrite removes the Window entirely in favor of bounded per-key heaps
  * with a partial pass before the exchange.
  *
  * When the rank IS kept (optimization round 16), the Window cannot be
  * removed — but its INPUT can still be capped: `Filter rn <= k` over
  * `Window(row_number)` keeps exactly the per-key top-k rows under the
  * window order, which is precisely [[TopKPerKey]]'s output, and
  * row_number re-derived over that capped set assigns the identical rank
  * values. So the filter-over-window pair is rewritten to run the Window
  * on `TopKPerKey(K, O, k, child)`: the per-key heaps cap every
  * (partition, key) at k rows map-side with an O(n·log k) pass instead of
  * the O(n·log n) per-partition sort, at most k rows per (partition, key)
  * cross the exchange, and the surviving Window sorts ≤ k rows per key.
  * At 100 TB that is the difference between sorting and shuffling every
  * scored row and shuffling k rows per key per map task.
  *
  * Conservative guards: exactly one window expression, plain `row_number`
  * with the standard frame, the filter references only the rank attribute.
  * Results are identical because the caller's ordering must already totally
  * order rows for row_number determinism (same contract TopKPerKey has).
  * Both shapes guard idempotence (the optimizer batch runs to fixpoint): a
  * child already capped by a matching TopKPerKey is reused, never re-wrapped.
  *
  * An EMPTY partitionSpec (global `row_number() over (order by x)` then
  * `rn <= k`) is also rewritten: TopKPerKeyExec maps empty keys to an
  * AllTuples final merge, so the partial pass caps every partition at k
  * rows and only k·numPartitions rows reach the single-partition merge —
  * strictly better than Spark's global Window (single-partition full sort).
  */
object RewriteRankFilterToTopK extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, _)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: AttributeReference, Literal(k: Int, _)) if a.semanticEquals(rn) && k == 1 => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference) if a.semanticEquals(rn) => Some(k)
    case _ => None
  }

  /** Spark's InferWindowGroupLimit (3.5+) may already have inserted a
    * sort-based WindowGroupLimit pre-filter below the Window; TopKPerKey
    * subsumes it (and needs no sorted input), so strip it. */
  private def stripGroupLimit(child: LogicalPlan): LogicalPlan = child match {
    case wgl: WindowGroupLimit => wgl.child
    case c => c
  }

  /** The capped child for (keys, order, k): reuse an existing matching
    * TopKPerKey (idempotence under the fixpoint batch — and the rank-kept
    * shape leaves a TopKPerKey below the Window that the rank-dropped
    * shape must not re-wrap), else insert one. */
  private def capped(partitionSpec: Seq[Expression], orderSpec: Seq[SortOrder],
      k: Int, child: LogicalPlan): LogicalPlan = stripGroupLimit(child) match {
    case t @ TopKPerKey(ks, os, kk, _)
        if ks == partitionSpec && os == orderSpec && kk <= k => t
    case c => TopKPerKey(partitionSpec, orderSpec, k, c)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Rank projected away: the Window disappears entirely.
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
        _, _, child, _)))
        if orderSpec.nonEmpty &&
          rankLimit(cond, alias.toAttribute).isDefined &&
          !projectList.exists(_.references.contains(alias.toAttribute)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val k = rankLimit(cond, alias.toAttribute).get
      if (k <= 0) LocalRelation(p.output.map(_.asInstanceOf[Attribute]))
      else Project(projectList, capped(partitionSpec, orderSpec, k, child))

    // Rank kept: cap the Window's input with per-key heaps; the Window
    // then ranks only the ≤ k survivors per key. Fires at the Filter node
    // regardless of what consumes the rank above.
    case f @ Filter(cond, w @ Window(Seq(alias @ Alias(
        WindowExpression(RowNumber(), WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
        _, _, child, _))
        if orderSpec.nonEmpty &&
          rankLimit(cond, alias.toAttribute).isDefined &&
          !stripGroupLimit(child).isInstanceOf[TopKPerKey] =>
      val k = rankLimit(cond, alias.toAttribute).get
      if (k <= 0) LocalRelation(f.output)
      else Filter(cond, w.withNewChildren(
        Seq(capped(partitionSpec, orderSpec, k, child))))
  }
}
