package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** sum-of-literal decomposition (reference:
  * nereids/rules/rewrite/SumLiteralRewrite.java — Doris rewrites
  * `sum(col + k)` into `sum(col) + count(col) * k`).
  *
  * Why it matters at scale: the rewritten form aggregates the bare
  * column, so several `sum(col + k1)`, `sum(col + k2)` measures in one
  * SELECT (the BI "adjusted revenue" pattern) collapse onto ONE shared
  * sum/count buffer pair instead of one buffer per literal; it also
  * unblocks rollup-MV matching, which stores sum(col)/count(col) but
  * cannot store every literal offset.
  *
  * NULL semantics are exact: sum skips NULL rows, so `sum(e + k)` sums
  * over exactly the rows where e is non-null — `count(e)` counts the
  * same rows; an all-NULL / empty group yields NULL on both sides
  * (sum(e) is NULL and NULL + 0*k is NULL).
  *
  * Scope guards: non-distinct, un-filtered sums only; INTEGRAL child
  * only — DECIMAL result precision differs between the two forms, and
  * DOUBLE addition is not associative (the rewrite could change the
  * last ulp). Non-ANSI per-row overflow of `e + k` is the one
  * divergence class (the original wraps per row, the rewrite at the
  * sum) — the same exposure as the reference's rule, and
  * undefined-results territory in both engines.
  *
  * OPT-IN via `spark.graft.sumLiteral.enabled`. */
class SumLiteralRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.sumLiteral.enabled").contains("true")

  private def typeOk(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case agg: Aggregate =>
        var changed = false
        val newExprs = agg.aggregateExpressions.map { ne =>
          ne.transformUp {
            case ae @ AggregateExpression(s @ Sum(add: Add, _), _, false, None, _)
                if add.deterministic =>
              val (e, lit) = (add.left, add.right) match {
                case (x, l: Literal) if l.value != null && typeOk(x) => (x, l)
                case (l: Literal, x) if l.value != null && typeOk(x) => (x, l)
                case _ => (null, null)
              }
              if (e == null) ae
              else {
                changed = true
                // fresh resultIds: reusing ae's id for BOTH new
                // aggregates would alias them to one buffer (caught by
                // the seed differential on first run)
                val sumE = AggregateExpression(s.copy(child = e),
                  ae.mode, ae.isDistinct, ae.filter, NamedExpression.newExprId)
                val cntE = AggregateExpression(Count(Seq(e)),
                  ae.mode, ae.isDistinct, ae.filter, NamedExpression.newExprId)
                // sum(e + k) == sum(e) + count(e) * k, in the ORIGINAL
                // result type (sum widens integrals to LONG already)
                Cast(
                  Add(Cast(sumE, ae.dataType),
                    Multiply(Cast(cntE, ae.dataType), Cast(lit, ae.dataType))),
                  ae.dataType)
              }
          } match {
            case n: NamedExpression => n
            case other => Alias(other, ne.name)(exprId = ne.exprId)
          }
        }
        if (changed) agg.copy(aggregateExpressions = newExprs) else agg
    }
}
