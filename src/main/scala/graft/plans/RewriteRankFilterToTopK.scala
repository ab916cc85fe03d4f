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
  * Conservative guards: exactly one window expression, plain `row_number`
  * with the standard frame, the filter references only the rank attribute,
  * and no downstream use of the rank. Results are identical because the
  * caller's ordering must already totally order rows for row_number
  * determinism (same contract TopKPerKey has).
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), WindowSpecDefinition(partitionSpec, orderSpec, _)), _)),
        _, _, child, _)))
        if orderSpec.nonEmpty &&
          rankLimit(cond, alias.toAttribute).isDefined &&
          !projectList.exists(_.references.contains(alias.toAttribute)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      val k = rankLimit(cond, alias.toAttribute).get
      // Spark's InferWindowGroupLimit (3.5+) may already have inserted a
      // sort-based WindowGroupLimit pre-filter below the Window; TopKPerKey
      // subsumes it (and needs no sorted input), so strip it.
      val realChild = child match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      if (k <= 0) LocalRelation(p.output.map(_.asInstanceOf[Attribute]))
      else Project(projectList, TopKPerKey(partitionSpec, orderSpec, k, realChild))
  }
}
