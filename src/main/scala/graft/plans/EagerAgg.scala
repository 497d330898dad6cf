package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Eager aggregation — partial aggregate pushed below a join
  * (reference: nereids/rules/exploration/eageraggregation/ and
  * PushDownAggThroughJoinOneSide.java; theory: Yan & Larson, "Eager
  * Aggregation and Lazy Aggregation", VLDB'95).
  *
  * Shape:  Aggregate(G, A, Join(l, r, INNER, lk = rk))  where every
  * aggregate references only the l side. The l side is pre-aggregated
  * on (G ∩ l) ∪ {lk} below the join; the final aggregate above combines
  * partials. Sound because the per-key r-match multiplicity distributes
  * over SUM/COUNT (each pre-agg group joins exactly the rows its
  * members did) and is irrelevant to MIN/MAX:
  *
  *   SUM(e)   -> partial SUM(e),   final SUM(partial)
  *   COUNT(e) -> partial COUNT(e), final coalesce(SUM(partial), 0)
  *   MIN/MAX  -> partial MIN/MAX,  final MIN/MAX(partial)
  *
  * At 100 TB this turns "shuffle every fact row to the join, then
  * aggregate" into "aggregate each scan partition down to its group
  * count first" — the join and final agg move orders of magnitude
  * fewer rows when keys are low-cardinality.
  *
  * OPT-IN like the reference's exploration rules (Doris gates these
  * behind session variables): fires only when
  * `spark.graft.eagerAgg.enabled = true`. Guard rails: no DISTINCT, no
  * FILTER clauses, no DecimalType sums (Spark widens decimal sum
  * precision, so partial-then-final would change the result type),
  * group keys must be plain attributes, and a marker alias prevents
  * re-firing on the rule's own output across optimizer iterations.
  */
class EagerAggRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val Marker = "__eager_p_"

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.eagerAgg.enabled").contains("true")

  private def equiKeys(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[Seq[(Attribute, Attribute)]] = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(a, b) => split(a) ++ split(b)
      case o => Seq(o)
    }
    val pairs = split(cond).map {
      case EqualTo(a: Attribute, b: Attribute)
          if l.outputSet.contains(a) && r.outputSet.contains(b) => Some((a, b))
      case EqualTo(a: Attribute, b: Attribute)
          if l.outputSet.contains(b) && r.outputSet.contains(a) => Some((b, a))
      case _ => None
    }
    if (pairs.forall(_.isDefined) && pairs.nonEmpty) Some(pairs.flatten)
    else None
  }

  /** decomposable agg? -> (partial function, partialAttr => final function) */
  private def decompose(ae: AggregateExpression)
      : Option[(AggregateFunction, Attribute => Expression)] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case s @ Sum(e, _) if !e.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        Some((s, a => Sum(a).toAggregateExpression()))
      case c @ Count(_) =>
        Some((c, a => Coalesce(Seq(
          Sum(a).toAggregateExpression(), Literal(0L)))))
      case m @ Min(_) => Some((m, a => Min(a).toAggregateExpression()))
      case m @ Max(_) => Some((m, a => Max(a).toAggregateExpression()))
      case _ => None
    }
  }

  /** the join below the aggregate, tolerating the attrs-only Project
    * column pruning inserts between them (dropped on rewrite — the
    * pushed aggregate re-prunes harder). */
  private def joinBelow(child: LogicalPlan): Option[Join] = child match {
    case j: Join => Some(j)
    case Project(plist, j: Join) if plist.forall(_.isInstanceOf[Attribute]) =>
      Some(j)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg @ Aggregate(g, a, child, _)
          if joinBelow(child).exists { case Join(l, r, Inner, Some(cond), _) =>
            eligible(g, a, l, r, cond)
          case _ => false } =>
        val j @ Join(l, r, Inner, Some(cond), hint) = joinBelow(child).get
        val keys = equiKeys(cond, l, r).get
        val lKeys = keys.map(_._1)
        val gl = g.collect { case at: Attribute if l.outputSet.contains(at) => at }
        // partial aggregate on the l side
        val partials = scala.collection.mutable.ArrayBuffer[(ExprId, NamedExpression, Attribute => Expression)]()
        a.foreach {
          case al @ Alias(ae: AggregateExpression, _) =>
            val (pf, fin) = decompose(ae).get
            val pAlias = Alias(pf.toAggregateExpression(), Marker + al.name)()
            partials += ((al.exprId, pAlias, fin))
          case _ => ()
        }
        val pushGroup = (gl ++ lKeys).distinct
        val pushed = Aggregate(pushGroup, pushGroup ++ partials.map(_._2), l)
        val newJoin = Join(pushed, r, Inner, Some(cond), hint)
        val finals = a.map {
          case at: Attribute => at
          case al @ Alias(ae: AggregateExpression, name) =>
            val (_, pAlias, fin) = partials.find(_._1 == al.exprId).get
            Alias(fin(pAlias.toAttribute), name)(exprId = al.exprId)
          case other => other
        }
        Aggregate(g, finals, newJoin)
    }

  private def eligible(g: Seq[Expression], a: Seq[NamedExpression],
      l: LogicalPlan, r: LogicalPlan, cond: Expression): Boolean = {
    // don't re-fire on our own output
    val alreadyPushed = l match {
      case Aggregate(_, aexprs, _, _) =>
        aexprs.exists(_.name.startsWith(Marker))
      case _ => false
    }
    !alreadyPushed &&
    equiKeys(cond, l, r).isDefined &&
    g.forall(_.isInstanceOf[Attribute]) &&
    a.forall {
      case _: Attribute => true
      case al @ Alias(ae: AggregateExpression, _) =>
        decompose(ae).isDefined && ae.references.subsetOf(l.outputSet)
      case _ => false
    } &&
    // at least one actual aggregate to push
    a.exists { case Alias(_: AggregateExpression, _) => true; case _ => false }
  }
}
