package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Pull-up-join-from-union-all (reference:
  * nereids/rules/rewrite/PullUpJoinFromUnionAll.java).
  *
  * `(a1 ⋈ r) UNION ALL (a2 ⋈ r)` scans and builds `r` once per branch;
  * inner joins distribute over UNION ALL, so the identity
  * `(a1 ∪ a2) ⋈ r` is exact and scans `r` ONCE. At 100 TB with a
  * dimension `r` this halves (or 1/N-ths) the broadcast/build work —
  * the reference added it for exactly the UNION-of-similar-branches
  * SQL that BI tools and MV rewrites emit.
  *
  * Conservative match: every union branch is
  * `Project(attrs)?(Join(l_i, r_i, INNER, cond_i))` with
  *  - all `r_i` pairwise sameResult (the shared side),
  *  - `cond_i` equal after positionally remapping l_i/r_i attrs onto
  *    branch 1 (sameResult guarantees positional correspondence),
  *  - project lists selecting the same join-output POSITIONS.
  * The rewrite keeps branch 1's exprIds throughout (Union.output
  * derives from its head child), so parents are unaffected.
  *
  * OPT-IN via `spark.graft.pullUpUnionJoin.enabled`. */
class PullUpUnionJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.pullUpUnionJoin.enabled").contains("true")

  private case class Branch(plist: Option[Seq[Attribute]], join: Join)

  private def asBranch(p: LogicalPlan): Option[Branch] = p match {
    case j @ Join(_, _, Inner, Some(_), _) => Some(Branch(None, j))
    case Project(plist, j @ Join(_, _, Inner, Some(_), _))
        if plist.forall(_.isInstanceOf[Attribute]) =>
      Some(Branch(Some(plist.map(_.asInstanceOf[Attribute])), j))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformUp {
      case u @ Union(children, false, false) if children.size >= 2 =>
        tryPullUp(u).getOrElse(u)
    }

  private def tryPullUp(u: Union): Option[LogicalPlan] = {
    val branches = u.children.map(asBranch)
    if (branches.exists(_.isEmpty)) return None
    val bs = branches.flatten
    val head = bs.head
    val hj = head.join
    if (!hj.condition.get.deterministic) return None

    // all shared sides equal; all conditions equal modulo positional remap
    val ok = bs.tail.forall { b =>
      val j = b.join
      j.right.sameResult(hj.right) &&
      j.left.output.size == hj.left.output.size &&
      j.right.output.size == hj.right.output.size && {
        val remap: Map[ExprId, Attribute] =
          (j.left.output.map(_.exprId).zip(hj.left.output) ++
           j.right.output.map(_.exprId).zip(hj.right.output)).toMap
        val mapped = j.condition.get.transform {
          case a: Attribute => remap.getOrElse(a.exprId, a)
        }
        mapped.canonicalized == hj.condition.get.canonicalized
      } && {
        // identical projected join-output positions
        (head.plist, b.plist) match {
          case (None, None) => true
          case (Some(hp), Some(bp)) if hp.size == bp.size =>
            val hPos = hp.map(a => hj.output.indexWhere(_.exprId == a.exprId))
            val bPos = bp.map(a => j.output.indexWhere(_.exprId == a.exprId))
            hPos == bPos && hPos.forall(_ >= 0)
          case _ => false
        }
      }
    }
    if (!ok) return None

    val newUnion = Union(bs.map(_.join.left), false, false)
    val newJoin = Join(newUnion, hj.right, Inner, hj.condition, hj.hint)
    Some(head.plist match {
      case Some(plist) => Project(plist, newJoin)
      case None => newJoin
    })
  }
}
