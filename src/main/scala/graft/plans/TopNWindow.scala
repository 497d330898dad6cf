package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** TopN over a ranking window → per-partition group limit (reference:
  * nereids/rules/rewrite/PushDownTopNThroughWindow.java — Doris turns
  * `ORDER BY rn LIMIT k`, where rn is the plan's single
  * row_number/rank/dense_rank output, into a PartitionTopN below the
  * window).
  *
  * The pagination-over-leaderboards idiom: rank rows inside each group,
  * then take the first k rows globally BY THAT RANK. Without the
  * rewrite every partition ranks ALL its rows, the full corpus sorts on
  * rn, and k rows survive — at 100 TB that is a global sort of the
  * whole table. With it, no row with rank > k can ever reach the global
  * top-k (every partition contributes min(|partition|, k) rows of rank
  * <= k, so at least min(total, k) better-or-equal-ranked rows exist),
  * hence `Filter(rn <= k)` directly above the Window is EXACT — and
  * that filter is precisely the shape Spark's native
  * InferWindowGroupLimit compiles into a WindowGroupLimit node, which
  * keeps only k rows per partition BEFORE the window sort buffers them.
  * The Spark-first form of the reference's PartitionTopN, for free,
  * once the filter exists.
  *
  * Fire conditions (mirroring the reference's guards):
  *  - the TopN's sort is a SINGLE ASCENDING key that is exactly the
  *    window's single output attribute (through an optional Project);
  *  - that output is row_number()/rank()/dense_rank() — functions whose
  *    value lower-bounds the row position within its partition;
  *  - no offset (Spark plans offsets as a separate node, not matched).
  * DESC never fires (large ranks are wanted). The TopN itself is KEPT —
  * the rewrite adds the filter, never moves the limit, so it is exact
  * even under rank ties across partitions.
  *
  * OPT-IN via `spark.graft.topnWindow.enabled`. */
class TopNWindowRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.topnWindow.enabled").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case topn @ GlobalLimit(IntegerLiteral(n),
          LocalLimit(IntegerLiteral(n2), s @ Sort(Seq(so), true, child, _)))
          if n == n2 && so.direction == Ascending =>
        rewrite(n, so, child) match {
          case Some(newChild) => topn.copy(child =
            LocalLimit(Literal(n2), s.copy(child = newChild)))
          case None => topn
        }
    }

  private def rewrite(n: Int, so: SortOrder, child: LogicalPlan): Option[LogicalPlan] =
    child match {
      case w: Window =>
        rankAttr(w, so).map(a => Filter(LessThanOrEqual(a, Literal(n)), w))
      case p @ Project(plist, w: Window) =>
        // the sort key must pass through the project unchanged (a bare
        // attribute or a direct alias of the window output)
        val sortId = so.child match {
          case a: Attribute => Some(a.exprId)
          case _ => None
        }
        sortId.flatMap { id =>
          val underlying = plist.collectFirst {
            case a: AttributeReference if a.exprId == id => a.exprId
            case al @ Alias(ar: AttributeReference, _) if al.exprId == id => ar.exprId
          }
          underlying.flatMap { wid =>
            rankAttrById(w, wid).map(a =>
              p.copy(child = Filter(LessThanOrEqual(a, Literal(n)), w)))
          }
        }
      case _ => None
    }

  /** The sort key names the window's single rank-like output. */
  private def rankAttr(w: Window, so: SortOrder): Option[Attribute] =
    so.child match {
      case a: Attribute => rankAttrById(w, a.exprId)
      case _ => None
    }

  private def rankAttrById(w: Window, id: ExprId): Option[Attribute] =
    w.windowExpressions match {
      case Seq(al @ Alias(we: WindowExpression, _))
          if al.exprId == id && isRankLike(we) => Some(al.toAttribute)
      case _ => None
    }

  /** row_number/rank/dense_rank over the standard growing frame — their
    * value never understates the row's position, so `fn <= n` keeps
    * every global-top-n candidate. Aggregate windows (sum/count...) do
    * NOT lower-bound position and never fire. */
  private def isRankLike(we: WindowExpression): Boolean = we.windowFunction match {
    case _: RowNumber | _: Rank | _: DenseRank =>
      !we.windowFunction.isInstanceOf[AggregateExpression] &&
        we.windowSpec.orderSpec.nonEmpty
    case _ => false
  }
}
