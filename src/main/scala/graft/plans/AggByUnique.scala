package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DecimalType

/** Aggregate elimination over a unique group key (reference:
  * nereids/rules/rewrite/EliminateGroupByKey.java +
  * EliminateAggregate.java — Doris removes grouping work when a key
  * constraint proves every group is a single row).
  *
  * `GROUP BY pk` over a scan whose `pk` is RELY-unique
  * ([[Constraints.uniqueKeys]]) has one row per group, so the whole
  * hash aggregate — a full shuffle of the table — collapses to a
  * stateless projection:
  *
  *   sum(x)   -> cast(x as sum's widened type)
  *   avg(x)   -> cast(x as double)
  *   min/max  -> x
  *   count(x) -> x IS NULL ? 0 : 1
  *   count(*) -> 1
  *
  * Guards: the child must be Project/Filter* over ONE leaf (a join
  * could duplicate key rows), group keys must be plain attributes with
  * a RELY-unique member among them, aggregates must be the closed-form
  * set above (no DISTINCT/FILTER, no decimal sum/avg — Spark widens
  * those types differently). At 100 TB this deletes the largest
  * shuffle in the BI-generated "GROUP BY pk re-aggregation" pattern.
  *
  * OPT-IN via `spark.graft.aggByUnique.enabled`. */
class AggByUniqueRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.aggByUnique.enabled").contains("true")

  private def overOneLeaf(p: LogicalPlan): Boolean = p match {
    case Project(plist, c) if plist.forall(_.isInstanceOf[Attribute]) => overOneLeaf(c)
    case Filter(cond, c) if cond.deterministic => overOneLeaf(c)
    case _: LeafNode => true
    case _ => false
  }

  /** per-row closed form of an aggregate call, if one exists. */
  private def perRow(ae: AggregateExpression): Option[Expression] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case Sum(e, _) if !e.dataType.isInstanceOf[DecimalType] &&
          !ae.dataType.isInstanceOf[DecimalType] => Some(Cast(e, ae.dataType))
      case Average(e, _) if !e.dataType.isInstanceOf[DecimalType] &&
          !ae.dataType.isInstanceOf[DecimalType] => Some(Cast(e, ae.dataType))
      case Min(e) => Some(e)
      case Max(e) => Some(e)
      case Count(Seq(Literal(v, _))) if v != null => Some(Literal(1L))
      case Count(Seq(e)) => Some(If(IsNull(e), Literal(0L), Literal(1L)))
      case First(e, false) => Some(e)
      case Last(e, false) => Some(e)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(g, a, child, _)
          if overOneLeaf(child) &&
            g.nonEmpty && g.forall(_.isInstanceOf[Attribute]) &&
            g.exists { case at: Attribute =>
              Constraints.uniqueKeys.contains(at.name.toLowerCase) } &&
            a.forall {
              case _: Attribute => true
              case al: Alias => al.child.deterministic &&
                al.child.collect { case ae: AggregateExpression => ae }
                  .forall(perRow(_).isDefined)
              case _ => false
            } =>
        val projList: Seq[NamedExpression] = a.map {
          case at: Attribute => at
          case al: Alias =>
            Alias(al.child.transform {
              case ae: AggregateExpression => perRow(ae).get
            }, al.name)(exprId = al.exprId)
        }
        Project(projList, child)
    }
}
