package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Correlated-scalar-aggregate-to-window rewrite (reference:
  * nereids/rules/rewrite/AggScalarSubQueryToWindowFunction.java).
  *
  * After Spark decorrelates `WHERE x > (SELECT avg(x) FROM t i WHERE
  * i.k = o.k)` the optimized plan is a self-join: the fact table is
  * scanned TWICE — once as the probe side, once under an Aggregate —
  * and joined on the correlation key. This rule replaces that shape
  * with a single scan + window aggregate partitioned by the key:
  *
  *   Join(left, Filter*(Aggregate(G, A, child)), INNER, G=keys ∧ res)
  *     where stripped(left) ≡ stripped(child)
  * →
  *   Filter(res ∧ notnull(keys), Project(left.out ++ aliases,
  *     Window(A-as-window-over-partitionBy(G), left)))
  *
  * At 100 TB this halves fact-table scans and replaces a
  * shuffle+shuffle+join with ONE shuffle+sort — the reference
  * motivates the rule with exactly this TPC-H Q17 pattern.
  *
  * Soundness notes (each guarded in [[eligible]]):
  *  - The join key set must cover ALL grouping attrs, so each probe
  *    row matches exactly its own group (group keys are unique on the
  *    agg side) and the join is 1:1 — otherwise a join could multiply
  *    rows and no window rewrite exists.
  *  - An inner equi-join drops null-key probe rows; the rewrite adds
  *    `IsNotNull(key)` filters to reproduce that exactly.
  *  - The two sides are compared structurally after stripping
  *    attrs-only Projects and collecting Filter conjuncts. Conjunct
  *    sets may differ only by `IsNotNull(a)` terms where EVERY
  *    aggregate's input is exactly `a` (a null input contributes
  *    nothing to a null-ignoring aggregate, so rows excluded on one
  *    side are no-ops on the other). Spark's constraint inference
  *    produces exactly this asymmetry: `isnotnull(l_quantity)` is
  *    inferred on the probe side from the comparison predicate but not
  *    under the aggregate.
  *  - Extra agg-side-only IsNotNull conjuncts can make a whole group
  *    vanish (join drops the probe rows, window would keep them with a
  *    NULL aggregate); they are accepted only when every aggregate
  *    output is null-rejected by the residual predicate, which then
  *    drops those rows on the window side too.
  *  - COUNT is excluded: count(*)/count(1) counts rows, so the
  *    null-input-is-a-no-op argument above does not apply, and
  *    count-over-empty-group is 0 (not NULL) so the null-rejection
  *    argument does not apply either.
  *
  * LEFT OUTER joins (the decorrelated shape of a SELECT-list scalar
  * subquery — "show each row with its group average") rewrite too:
  * every probe row is kept, null keys get a NULL mask instead of the
  * window value (EqualTo never matches them), and extra guards bail on
  * right-side filters, non-key ON conjuncts, and group-attr
  * passthroughs whose vanished-group NULLs a window can't reproduce.
  *
  * OPT-IN via `spark.graft.scalarAggWindow.enabled` (the reference
  * gates the rule behind a session variable too). */
class ScalarAggToWindowRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.scalarAggWindow.enabled").contains("true")

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case o => Seq(o)
  }

  /** Strip attrs-only Projects and deterministic Filters; return
    * (base, filter conjuncts outermost-first). */
  private def peel(p: LogicalPlan): Option[(LogicalPlan, Seq[Expression])] = p match {
    case Project(plist, child) if plist.forall(_.isInstanceOf[Attribute]) =>
      peel(child)
    case Filter(cond, child) if cond.deterministic =>
      peel(child).map { case (b, fs) => (b, splitConj(cond) ++ fs) }
    case other => Some((other, Nil))
  }

  private def windowable(f: AggregateFunction): Boolean = f match {
    case _: Sum | _: Average | _: Min | _: Max => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case j: Join if (j.joinType == Inner || j.joinType == LeftOuter) &&
          j.condition.isDefined =>
        tryRewrite(j).getOrElse(j)
    }

  private def tryRewrite(j: Join): Option[LogicalPlan] = {
    val (left, right, cond) = (j.left, j.right, j.condition.get)
    val outer = j.joinType == LeftOuter

    // 1. peel the agg side: Filter* above Aggregate, all deterministic
    var rightFilters = Seq.empty[Expression]
    var r = right
    while (r.isInstanceOf[Filter]) {
      val Filter(c, ch) = r
      if (!c.deterministic) return None
      rightFilters ++= splitConj(c); r = ch
    }
    val agg = r match {
      case a: Aggregate => a
      case _ => return None
    }
    val groupAttrs = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }
    if (groupAttrs.isEmpty) return None // global window would single-partition

    // 2. each agg output: a grouping attr, or an alias over windowable
    //    aggregate functions whose every input is a single attribute
    val aggAliases = agg.aggregateExpressions.collect { case al: Alias => al }
    val aggFns = aggAliases.flatMap(_.collect { case ae: AggregateExpression => ae })
    if (aggFns.isEmpty) return None
    val aggInputAttrs: Seq[Attribute] = aggFns.map { ae =>
      if (ae.isDistinct || ae.filter.isDefined || !windowable(ae.aggregateFunction))
        return None
      ae.aggregateFunction.children.filter(_ != Literal(null)) match {
        case Seq(a: Attribute) => a
        case _ => return None
      }
    }
    val ok = agg.aggregateExpressions.forall {
      case a: Attribute => groupAttrs.contains(a)
      case al: Alias => al.child.deterministic
      case _ => false
    }
    if (!ok) return None
    // LEFT OUTER: a Filter above the aggregate or an alias mixing
    // grouping attrs with aggregates would need unmatched-row
    // compensation beyond the per-key NULL mask below — bail.
    if (outer) {
      if (rightFilters.nonEmpty) return None
      val aliasRefsGroup = aggAliases.exists(
        _.child.references.exists(r => groupAttrs.exists(_.exprId == r.exprId)))
      if (aliasRefsGroup) return None
    }

    // 3. split the join condition into group-key equalities and residual
    val aggOut = agg.outputSet
    var keyPairs = Seq.empty[(Attribute, Attribute, Boolean)] // (leftKey, groupKey, nullSafe)
    var residual = Seq.empty[Expression]
    splitConj(cond).foreach {
      case eq @ EqualTo(a: Attribute, b: Attribute)
          if left.outputSet.contains(a) && groupAttrs.exists(_.exprId == b.exprId) =>
        keyPairs :+= ((a, b, false)); val _ = eq
      case EqualTo(a: Attribute, b: Attribute)
          if left.outputSet.contains(b) && groupAttrs.exists(_.exprId == a.exprId) =>
        keyPairs :+= ((b, a, false))
      case EqualNullSafe(a: Attribute, b: Attribute)
          if left.outputSet.contains(a) && groupAttrs.exists(_.exprId == b.exprId) =>
        keyPairs :+= ((a, b, true))
      case EqualNullSafe(a: Attribute, b: Attribute)
          if left.outputSet.contains(b) && groupAttrs.exists(_.exprId == a.exprId) =>
        keyPairs :+= ((b, a, true))
      case other if other.deterministic => residual :+= other
      case _ => return None
    }
    if (!groupAttrs.forall(g => keyPairs.exists(_._2.exprId == g.exprId))) return None
    // LEFT OUTER: a non-key conjunct in the ON clause selects which rows
    // null-extend (it does NOT filter) — a Filter above the window would
    // change semantics, so only pure key-equality conditions rewrite
    if (outer && residual.nonEmpty) return None

    // 4. compare the two sides modulo exprIds
    val (lBase, lFilters) = peel(left).getOrElse(return None)
    val (aBase, aFilters) = peel(agg.child).getOrElse(return None)
    if (!lBase.sameResult(aBase)) return None
    if (lBase.output.size != aBase.output.size) return None
    val a2l: Map[ExprId, Attribute] =
      aBase.output.map(_.exprId).zip(lBase.output).toMap
    def remap(e: Expression): Expression = e.transform {
      case at: Attribute => a2l.getOrElse(at.exprId, at)
    }
    val lSet = lFilters.map(_.canonicalized).toSet
    val aMapped = aFilters.map(remap)
    val aSet = aMapped.map(_.canonicalized).toSet
    val leftExtra = lFilters.filterNot(f => aSet.contains(f.canonicalized))
    val aggExtra = aMapped.filterNot(f => lSet.contains(f.canonicalized))

    // mapped agg-input attrs in left space — extras must target exactly these
    val inputsMapped = aggInputAttrs.map(a => a2l.getOrElse(a.exprId, a))
    def isNoOpNotNull(e: Expression): Boolean = e match {
      case IsNotNull(x: Attribute) =>
        inputsMapped.nonEmpty && inputsMapped.forall(_.exprId ==
          a2l.getOrElse(x.exprId, x).exprId)
      case _ => false
    }
    if (!leftExtra.forall(e => isNoOpNotNull(e))) return None
    if (aggExtra.nonEmpty) {
      if (!aggExtra.forall(e => isNoOpNotNull(remap(e)))) return None
      if (outer) {
        // a vanished group NULLs the join's group-attr passthroughs but
        // our rewrite would emit the (non-null) probe key; agg-value
        // outputs are exact (the window sees only null inputs there and
        // a null-ignoring aggregate returns NULL, matching the
        // null-extended row) — so bail only on bare group-attr outputs
        if (agg.aggregateExpressions.exists(_.isInstanceOf[Attribute]))
          return None
      } else {
        // INNER drops the probe rows of a vanished group entirely; the
        // residual must null-reject every agg output to do the same
        val nullRejected = (residual ++ rightFilters).flatMap {
          case IsNotNull(x: Attribute) => Some(x.exprId)
          case _ => None
        }.toSet
        if (!aggAliases.forall(al => nullRejected.contains(al.exprId))) return None
      }
    }

    // 5. build window exprs over the probe side
    val partKeys = groupAttrs.map(g => a2l.getOrElse(g.exprId, g))
    if (!partKeys.forall(left.outputSet.contains)) return None
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, UnboundedFollowing)
    val spec = WindowSpecDefinition(partKeys, Nil, frame)
    // LEFT OUTER null-extends unmatched probe rows; a NULL key never
    // matches under EqualTo, so mask agg values for null keys
    val nullableEqKeys = keyPairs.collect {
      case (lk, _, false) if lk.nullable => lk }
    def maskOuter(e: Expression): Expression =
      if (!outer || nullableEqKeys.isEmpty) e
      else If(nullableEqKeys.map(k => IsNull(k): Expression).reduce(Or),
        Literal(null, e.dataType), e)
    var wAliases = Seq.empty[Alias]
    val replacements: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case ga: Attribute =>
        Alias(a2l.getOrElse(ga.exprId, ga), ga.name)(exprId = ga.exprId)
      case al: Alias =>
        val newChild = al.child.transform {
          case ae: AggregateExpression =>
            val w = Alias(WindowExpression(remap(ae).asInstanceOf[AggregateExpression],
              spec), s"__saw_w${wAliases.size}")()
            wAliases :+= w
            w.toAttribute
          case at: Attribute => a2l.getOrElse(at.exprId, at)
        }
        Alias(maskOuter(newChild), al.name)(exprId = al.exprId)
    }
    // window inputs must be available on the probe side
    if (!wAliases.flatMap(_.references.filterNot(a =>
        wAliases.exists(_.exprId == a.exprId))).forall(a =>
        left.outputSet.contains(a) || partKeys.exists(_.exprId == a.exprId)))
      return None

    val win = Window(wAliases, partKeys, Nil, left)
    val proj = Project(left.output ++ replacements, win)
    // INNER drops null-key probe rows (EqualTo never matches them);
    // LEFT OUTER keeps every probe row, so no key filter there
    val notNullKeys =
      if (outer) Nil
      else keyPairs.collect { case (lk, _, false) => IsNotNull(lk): Expression }
    val allConds = (residual ++ rightFilters ++ notNullKeys).distinct
    Some(if (allConds.isEmpty) proj
         else Filter(allConds.reduce(And), proj))
  }
}
