package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Eager aggregation on BOTH join inputs (reference:
  * nereids/rules/exploration/eageraggregation/PushDownAggThroughJoin.java
  * — the two-sided sibling of PushDownAggThroughJoinOneSide covered by
  * `EagerAggRule`; theory: Yan & Larson VLDB'95 "double eager").
  *
  * Shape: Aggregate(G, A, Join(l, r, INNER, lk = rk)) where every
  * aggregate references only ONE side (different aggregates may pick
  * different sides) or nothing (COUNT(*)). Both sides pre-aggregate on
  * (G ∩ side) ∪ {side keys} plus a group row count; the join then runs
  * over two group-level relations and the final aggregate restores join
  * multiplicity arithmetically — each joined partial row stands for
  * cntL × cntR original rows:
  *
  *   SUM_l(e)  -> final SUM(p_sum  * cntR)        (symmetrically for r)
  *   COUNT_l(e)-> final coalesce(SUM(p_cnt * cntR), 0)
  *   COUNT(*)  -> final coalesce(SUM(cntL * cntR), 0)
  *   MIN/MAX   -> final MIN(p)/MAX(p)  (multiplicity-invariant)
  *
  * At 100 TB this collapses a fact-fact join to a group-level join:
  * both shuffles move one row per (group, key) instead of one per input
  * row — the biggest available win when both sides are large and the
  * group/key space is small.
  *
  * OPT-IN via `spark.graft.eagerAggBoth.enabled` (the reference gates
  * its exploration rules behind session variables the same way).
  * Guard rails: inner equi-join only, plain-attribute group keys, no
  * DISTINCT/FILTER, SUMs restricted to integral inputs — re-associating
  * floating-point summation (p_sum * cnt) would change rounding, and
  * this engine treats bit-identical results as part of the contract
  * (money runs as exact integer cents, see queries.Q). A marker alias
  * prevents re-firing on the rule's own output.
  */
class EagerAggBothRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Marker = "__eager2_p_"

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.eagerAggBoth.enabled").contains("true")

  private def equiOnly(cond: Expression, l: LogicalPlan, r: LogicalPlan): Boolean = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case o => Seq(o)
    }
    split(cond).forall {
      case EqualTo(a: Attribute, b: Attribute) =>
        (l.outputSet.contains(a) && r.outputSet.contains(b)) ||
          (l.outputSet.contains(b) && r.outputSet.contains(a))
      case _ => false
    }
  }

  private def integral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType

  /** which side an eligible aggregate belongs to: Some(true)=left,
    * Some(false)=right, None=no references (COUNT of a literal). */
  private def side(ae: AggregateExpression, l: LogicalPlan, r: LogicalPlan): Option[Option[Boolean]] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    val refs = ae.references
    val s: Option[Boolean] =
      if (refs.isEmpty) return ae.aggregateFunction match {
        case Count(_) => Some(None) // COUNT(*) / COUNT(lit)
        case _ => None
      }
      else if (refs.subsetOf(l.outputSet)) Some(true)
      else if (refs.subsetOf(r.outputSet)) Some(false)
      else return None
    ae.aggregateFunction match {
      case Sum(e, _) if integral(e.dataType) => Some(s)
      case Count(_) | Min(_) | Max(_) => Some(s)
      case _ => None
    }
  }

  private def joinBelow(child: LogicalPlan): Option[Join] = child match {
    case j: Join => Some(j)
    case Project(plist, j: Join) if plist.forall(_.isInstanceOf[Attribute]) =>
      Some(j)
    case _ => None
  }

  private def eligible(g: Seq[Expression], a: Seq[NamedExpression],
      l: LogicalPlan, r: LogicalPlan, cond: Expression): Boolean = {
    def marked(p: LogicalPlan): Boolean = p match {
      case Aggregate(_, aexprs, _, _) => aexprs.exists(_.name.startsWith(Marker))
      case _ => false
    }
    val sides = a.collect { case Alias(ae: AggregateExpression, _) => side(ae, l, r) }
    !marked(l) && !marked(r) &&
    equiOnly(cond, l, r) &&
    g.forall(_.isInstanceOf[Attribute]) &&
    a.forall {
      case _: Attribute => true
      case Alias(ae: AggregateExpression, _) => side(ae, l, r).isDefined
      case _ => false
    } &&
    sides.nonEmpty && sides.forall(_.isDefined) &&
    // genuinely two-sided: aggregates on BOTH inputs (the one-sided
    // case belongs to EagerAggRule, which prunes the untouched side)
    sides.flatten.contains(Some(true)) && sides.flatten.contains(Some(false))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case Aggregate(g, a, child, _)
          if joinBelow(child).exists { case Join(l, r, Inner, Some(cond), _) =>
            eligible(g, a, l, r, cond)
          case _ => false } =>
        val Join(l, r, Inner, Some(cond), hint) = joinBelow(child).get
        val gAttrs = g.map(_.asInstanceOf[Attribute])

        def sideKeys(p: LogicalPlan): Seq[Attribute] =
          cond.references.toSeq.filter(p.outputSet.contains)

        // per-side partial aggregates, each with a group row count
        def build(p: LogicalPlan): (Aggregate, Attribute,
            scala.collection.mutable.Map[ExprId, Attribute]) = {
          val partials = scala.collection.mutable.ArrayBuffer.empty[NamedExpression]
          val pAttr = scala.collection.mutable.Map.empty[ExprId, Attribute]
          a.foreach {
            case al @ Alias(ae: AggregateExpression, _)
                if ae.references.nonEmpty && ae.references.subsetOf(p.outputSet) =>
              val pa = Alias(ae.aggregateFunction.toAggregateExpression(),
                Marker + al.name)()
              partials += pa
              pAttr(al.exprId) = pa.toAttribute
            case _ => ()
          }
          val cnt = Alias(Count(Literal(1)).toAggregateExpression(), Marker + "cnt")()
          val grp = (gAttrs.filter(p.outputSet.contains) ++ sideKeys(p)).distinct
          (Aggregate(grp, grp ++ partials :+ cnt, p), cnt.toAttribute, pAttr)
        }
        val (pushedL, cntL, mapL) = build(l)
        val (pushedR, cntR, mapR) = build(r)
        val newJoin = Join(pushedL, pushedR, Inner, Some(cond), hint)

        def times(p: Attribute, cnt: Attribute): Expression =
          Multiply(p, if (cnt.dataType == p.dataType) cnt else Cast(cnt, p.dataType))

        val finals = a.map {
          case at: Attribute => at
          case al @ Alias(ae: AggregateExpression, name) =>
            val otherCnt = if (mapL.contains(al.exprId)) cntR else cntL
            val fin: Expression = ae.aggregateFunction match {
              case _ if ae.references.isEmpty => // COUNT(*)
                Coalesce(Seq(Sum(Multiply(cntL, cntR)).toAggregateExpression(),
                  Literal(0L)))
              case Sum(_, _) =>
                val p = mapL.getOrElse(al.exprId, mapR(al.exprId))
                Sum(times(p, otherCnt)).toAggregateExpression()
              case Count(_) =>
                val p = mapL.getOrElse(al.exprId, mapR(al.exprId))
                Coalesce(Seq(Sum(times(p, otherCnt)).toAggregateExpression(),
                  Literal(0L)))
              case Min(_) =>
                Min(mapL.getOrElse(al.exprId, mapR(al.exprId))).toAggregateExpression()
              case Max(_) =>
                Max(mapL.getOrElse(al.exprId, mapR(al.exprId))).toAggregateExpression()
              case other =>
                throw new IllegalStateException(s"unexpected agg $other")
            }
            Alias(fin, name)(exprId = al.exprId)
          case other => other
        }
        Aggregate(gAttrs, finals, newJoin)
    }
}
