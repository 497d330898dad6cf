package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Merge-percentile-to-array (reference:
  * nereids/rules/rewrite/MergePercentileToArray.java).
  *
  * `SELECT percentile(x, .5), percentile(x, .9), percentile(x, .99)`
  * plans THREE independent Percentile aggregates in Spark, each
  * buffering its own copy of every input value (Percentile's state is
  * an OpenHashMap of value counts). This rule fuses all exact
  * percentiles over the same (column, frequency) into ONE
  * array-percentage Percentile and re-projects each original output as
  * an element lookup — one buffer, one sort, N answers. At 100 TB the
  * buffered-values copy count drops from N per group to 1.
  *
  * Guards: only non-DISTINCT, non-FILTER Percentile calls with foldable
  * scalar percentages merge; groups need >= 2 members; everything else
  * in the aggregate list passes through untouched. The rewrite keeps
  * the original output exprIds via an upper Project, so parents are
  * unaffected.
  *
  * OPT-IN via `spark.graft.mergePercentile.enabled` (session-gated like
  * the reference's rewrite). */
class MergePercentileRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.mergePercentile.enabled").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate => tryMerge(agg).getOrElse(agg)
    }

  /** An output alias whose child contains exactly ONE aggregate call,
    * an eligible scalar-percentage Percentile, possibly nested under
    * deterministic scalar wrappers (round, cast, arithmetic). */
  private case class Member(alias: Alias, ae: AggregateExpression,
                            pct: Percentile, percentage: Expression)

  private def asMember(al: Alias): Option[Member] = {
    if (!al.child.deterministic) return None
    al.child.collect { case ae: AggregateExpression => ae } match {
      case Seq(ae @ AggregateExpression(
          p @ Percentile(_, pctExpr, _, _, _, false), _, false, None, _))
          if pctExpr.foldable && !pctExpr.dataType.isInstanceOf[
            org.apache.spark.sql.types.ArrayType] && ae.references.nonEmpty =>
        Some(Member(al, ae, p, pctExpr))
      case _ => None
    }
  }

  private def tryMerge(agg: Aggregate): Option[LogicalPlan] = {
    // mergeable members keyed by (child, frequency) canonical form
    val members = agg.aggregateExpressions.collect {
      case al: Alias => asMember(al)
    }.flatten.map { m =>
      ((m.pct.child.canonicalized, m.pct.frequencyExpression.canonicalized), m)
    }
    val groups = members.groupBy(_._1).view.mapValues(_.map(_._2))
      .filter(_._2.size >= 2).toMap
    if (groups.isEmpty) return None

    val mergedAliases = scala.collection.mutable.LinkedHashMap[
      (Expression, Expression), (Alias, Seq[Member])]()
    groups.zipWithIndex.foreach { case ((key, ms), i) =>
      val arr = CreateArray(ms.map(_.percentage))
      val merged = Percentile(ms.head.pct.child, arr,
        ms.head.pct.frequencyExpression)
      mergedAliases(key) = (
        Alias(merged.toAggregateExpression(), s"__pm_arr$i")(), ms)
    }
    val mergedIds = groups.values.flatten.map(_.alias.exprId).toSet

    val newAggList: Seq[NamedExpression] =
      agg.aggregateExpressions.filterNot {
        case al: Alias => mergedIds.contains(al.exprId)
        case _ => false
      } ++ mergedAliases.values.map(_._1)
    val newAgg = Aggregate(agg.groupingExpressions, newAggList, agg.child)

    // upper project: original outputs; each member's aggregate call is
    // replaced by an element lookup inside its original wrapper expr
    val projList: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case al: Alias if mergedIds.contains(al.exprId) =>
        val (arrAlias, ms) = mergedAliases.values.find(
          _._2.exists(_.alias.exprId == al.exprId)).get
        val idx = ms.indexWhere(_.alias.exprId == al.exprId)
        val m = ms(idx)
        val rewritten = al.child.transform {
          case e: AggregateExpression if e fastEquals m.ae =>
            GetArrayItem(arrAlias.toAttribute, Literal(idx))
        }
        Alias(rewritten, al.name)(exprId = al.exprId)
      case other => other.toAttribute
    }
    Some(Project(projList, newAgg))
  }
}
