package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Group-key simplification (reference:
  * nereids/rules/rewrite/SimplifyAggGroupBy.java — Doris drops grouping
  * expressions that are functions of other group keys).
  *
  * Grouping by (k, f(k)) partitions rows exactly like grouping by k: a
  * deterministic f cannot split a k-group. So the BI staple
  * `GROUP BY d, year(d), month(d)` should shuffle d alone.
  *
  * By the time injected rules run, Spark's PullOutGroupingExpressions
  * has rewritten expression keys into `_groupingexpression` attributes
  * defined by a Project below the Aggregate, so the rule matches THAT
  * shape: a group attribute whose defining Project alias is a
  * deterministic expression over base columns that are themselves
  * surviving group keys is (a) dropped from the grouping list and
  * (b) re-inlined as its defining expression wherever the result
  * expressions referenced it — the output schema and values are
  * untouched, only the shuffle key narrows.
  *
  * OPT-IN via `spark.graft.simplifyAggGroupBy.enabled`. */
class SimplifyAggGroupByRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.simplifyAggGroupBy.enabled").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(g, a, child @ Project(pl, _), _)
          if g.size > 1 && g.forall(_.isInstanceOf[AttributeReference]) =>
        val defs: Map[ExprId, Expression] =
          pl.collect { case al: Alias => al.exprId -> al.child }.toMap
        val groupAttrs = g.map(_.asInstanceOf[AttributeReference])
        // keys that are plain base columns (pass-through attrs, or
        // aliases of bare attrs) anchor the functional dependency
        def baseOf(at: AttributeReference): Option[ExprId] = defs.get(at.exprId) match {
          case None => Some(at.exprId)
          case Some(ar: AttributeReference) => Some(ar.exprId)
          case _ => None
        }
        val anchorIds = groupAttrs.flatMap(baseOf).toSet
        val (kept, dropped) = groupAttrs.partition { at =>
          baseOf(at).isDefined || {
            val d = defs(at.exprId)
            !(d.deterministic &&
              !d.exists(_.isInstanceOf[PlanExpression[_]]) &&
              d.references.nonEmpty &&
              d.references.forall(r => anchorIds.contains(r.exprId)))
          }
        }
        if (dropped.isEmpty) agg
        else {
          val droppedIds = dropped.map(_.exprId).toSet
          // A kept key may be an ALIAS of its base column (view shape:
          // `event_id AS WatchID`); the bare base is then pruned from
          // the Project's output, so a re-inlined definition must
          // reference the surviving ALIAS, not the base — otherwise the
          // aggregate's result expressions bind against an attribute
          // the child no longer produces (found by the all-rules-on
          // composition law over cb_q32).
          val baseToKept: Map[ExprId, AttributeReference] =
            kept.flatMap(k => baseOf(k).map(_ -> k)).toMap
          def inline(d: Expression): Expression = d.transform {
            case r: AttributeReference if baseToKept.get(r.exprId)
                .exists(_.exprId != r.exprId) => baseToKept(r.exprId)
          }
          // result expressions re-inline the dropped keys' definitions
          // (rebased onto the surviving group attrs)
          val newA = a.map { ne =>
            ne.transformUp {
              case at: AttributeReference if droppedIds.contains(at.exprId) =>
                inline(defs(at.exprId))
            } match {
              case n: NamedExpression => n
              case other => Alias(other, ne.name)(exprId = ne.exprId)
            }
          }
          agg.copy(groupingExpressions = kept, aggregateExpressions = newA)
        }
    }
}
