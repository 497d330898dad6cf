package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

object UnequalInfer {
  /** Apply-once marker (same convergence discipline as OrExtract /
    * MaxMinFilter). */
  val Derived = TreeNodeTag[Boolean]("graft.unequalInfer.derived")
}

/** Transitive range inference through NON-EQUI comparison chains
  * (reference: nereids/rules/rewrite/UnequalPredicateInfer.java — Doris
  * computes the closure of <, <=, = edges among columns and literals
  * and materializes the implied column-vs-literal bounds).
  *
  * What Spark already does natively (probed, Spark 4.1):
  * InferFiltersFromConstraints infers through EQUI-join keys
  * (`a.k = b.k AND a.k > 10` ⇒ `b.k > 10` reaches b's scan). What it
  * does NOT do: chains through inequality join conditions —
  * `l.ship < o.ord AND o.ord < '1995-01-01'` leaves l's scan with
  * IsNotNull only, a full fact read that the implied
  * `l.ship < '1995-01-01'` would zonemap-prune. At 100 TB the date-
  * banded non-equi join (every "events before the order cutoff" query)
  * scans the whole fact table without this.
  *
  * Mechanics: for an INNER / CROSS / LEFT SEMI join, collect comparison
  * conjuncts from the join condition and each side's directly-below
  * Filter (optionally under a Project): `x < y`, `x <= y`, `x = y`
  * where x, y are bare same-type attributes or foldable literals. Build
  * the strict/non-strict reachability closure (Floyd-Warshall over the
  * ≤ graph, a path is strict if any hop is), then emit every implied
  * attribute-vs-literal bound not already present, as a Filter on the
  * attribute's side — native PushDownPredicates sinks it to the scan.
  *
  * Soundness (3VL): every source conjunct evaluates TRUE for a matched
  * pair (join condition) or for every surviving row of a side (child
  * filter). A derived bound follows from a chain of TRUE comparisons,
  * so it is TRUE for every row of its side that can appear in a match;
  * filtering that side with it removes only never-matching rows —
  * exactly the inner/semi join contract (outer joins are excluded:
  * filtering a preserved side would drop rows). Convergence: rewritten
  * joins carry [[UnequalInfer.Derived]] and are never re-derived.
  *
  * OPT-IN via `spark.graft.unequalInfer.enabled`. */
class UnequalPredicateInferRule(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {
  import UnequalInfer.Derived

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.unequalInfer.enabled").contains("true")

  /** Closure bail-out: pathological predicates are not worth O(n^3). */
  private val MaxNodes = 32

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformDown {
      case j @ Join(left, right, jt, Some(cond), hint)
          if (jt == Inner || jt == Cross || jt == LeftSemi) &&
            j.getTagValue(Derived).isEmpty =>
        val sources = splitConjunctivePredicates(cond) ++
          childFilterConjuncts(left) ++ childFilterConjuncts(right)
        val derived = infer(sources)
        val leftPreds = derived.filter(_.references.subsetOf(left.outputSet))
        val rightPreds = derived.filter(_.references.subsetOf(right.outputSet))
        if (leftPreds.isEmpty && rightPreds.isEmpty) { j.setTagValue(Derived, true); j }
        else {
          def addFilter(child: LogicalPlan, preds: Seq[Expression]): LogicalPlan =
            if (preds.isEmpty) child else Filter(preds.reduceLeft(And), child)
          val out = Join(addFilter(left, leftPreds),
            addFilter(right, rightPreds), jt, Some(cond), hint)
          out.setTagValue(Derived, true)
          out
        }
    }

  private def childFilterConjuncts(p: LogicalPlan): Seq[Expression] = p match {
    case Filter(c, _) => splitConjunctivePredicates(c)
    case Project(_, Filter(c, _)) => splitConjunctivePredicates(c)
    case _ => Nil
  }

  /** A graph node: a bare attribute or a foldable literal-valued
    * expression, keyed by canonical form. */
  private def nodeOf(e: Expression): Option[Expression] = e match {
    case a: AttributeReference => Some(a)
    case l if l.foldable && l.deterministic => Some(l)
    case _ => None
  }

  /** Implied attribute-vs-literal comparisons from the <= /< closure. */
  private def infer(sources: Seq[Expression]): Seq[Expression] = {
    // collect edges x -> y (x less than y; strict flag)
    val edges = sources.flatMap {
      case LessThan(a, b) => pair(a, b).map { case (x, y) => (x, y, true) }.toSeq
      case LessThanOrEqual(a, b) => pair(a, b).map { case (x, y) => (x, y, false) }.toSeq
      case GreaterThan(a, b) => pair(b, a).map { case (x, y) => (x, y, true) }.toSeq
      case GreaterThanOrEqual(a, b) => pair(b, a).map { case (x, y) => (x, y, false) }.toSeq
      case EqualTo(a, b) => pair(a, b).toSeq.flatMap { case (x, y) =>
        Seq((x, y, false), (y, x, false)) }
      case _ => Nil
    }
    if (edges.isEmpty) return Nil
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
      .foldLeft(Vector.empty[Expression]) { (acc, n) =>
        if (acc.exists(_.semanticEquals(n))) acc else acc :+ n
      }
    if (nodes.size > MaxNodes) return Nil
    def indexOf(e: Expression): Int = nodes.indexWhere(_.semanticEquals(e))
    val n = nodes.size
    // reach(i)(j): 0 = none, 1 = <=, 2 = <
    val reach = Array.fill(n, n)(0)
    edges.foreach { case (x, y, strict) =>
      val (i, k) = (indexOf(x), indexOf(y))
      reach(i)(k) = math.max(reach(i)(k), if (strict) 2 else 1)
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) > 0 && reach(k)(j) > 0)
        reach(i)(j) = math.max(reach(i)(j), math.max(reach(i)(k), reach(k)(j)))
    val out = Seq.newBuilder[Expression]
    for (i <- 0 until n; j <- 0 until n; if reach(i)(j) > 0 && i != j) {
      (nodes(i), nodes(j)) match {
        case (a: AttributeReference, l) if l.foldable =>
          out += (if (reach(i)(j) == 2) LessThan(a, l) else LessThanOrEqual(a, l))
        case (l, a: AttributeReference) if l.foldable =>
          out += (if (reach(i)(j) == 2) GreaterThan(a, l) else GreaterThanOrEqual(a, l))
        case _ => // attr-vs-attr: new join predicates are out of scope here
      }
    }
    // drop anything already present among the sources
    out.result().filterNot(d => sources.exists(_.semanticEquals(d)))
      .foldLeft(Vector.empty[Expression]) { (acc, d) =>
        if (acc.exists(_.semanticEquals(d))) acc else acc :+ d
      }
  }

  /** Both operands usable and of identical type (no implicit casts —
    * mixed-type chains are out of scope). */
  private def pair(a: Expression, b: Expression): Option[(Expression, Expression)] =
    (nodeOf(a), nodeOf(b)) match {
      case (Some(x), Some(y)) if x.dataType == y.dataType &&
        RowOrdering.isOrderable(x.dataType) => Some((x, y))
      case _ => None
    }
}
