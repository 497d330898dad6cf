package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, IsNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Join elimination by declared PK-FK / uniqueness constraints
  * (reference: nereids/rules/rewrite/EliminateJoinByFK.java and
  * EliminateJoinByUnique.java — Doris drops a join against a parent
  * table when constraints prove it neither filters nor duplicates rows
  * and no parent column is consumed).
  *
  * Spark has no informational constraints, so [[Constraints]] is the
  * RELY registry (trusted metadata, exactly like a Doris/Oracle RELY
  * constraint — declaring a false constraint is user error, same as the
  * reference). Two shapes fire, both only when nothing above the join
  * references the parent side:
  *
  *  - INNER join child.fk = parent.pk, fk declared FOREIGN KEY (RELY):
  *    the PK side is unique (no duplication) and every non-null fk has
  *    a match (no filtering beyond fk IS NOT NULL) — the join is
  *    replaced by `Filter(IsNotNull(fk), child)`. The IsNotNull guard
  *    keeps the rewrite sound even for a nullable fk column.
  *  - LEFT OUTER join child.k = parent.uk, uk declared UNIQUE: the
  *    parent can only annotate, never filter or duplicate — the join is
  *    replaced by the child verbatim (no fk declaration needed).
  *
  * The parent side must prune down to a bare scan of the key column —
  * any residual predicate (except the IsNotNull the optimizer itself
  * infers on an inner-join key) means the join filters rows and is NOT
  * eliminated.
  *
  * 100 TB impact: the eliminated join is a full shuffle (or broadcast
  * build) of the parent table that produced nothing — the reference
  * added these rules for exactly the BI-generated-SQL pattern where
  * views join dimension tables the final query never touches.
  */
object Constraints {
  /** unique / primary key column names (RELY). Fixture defaults match
    * the TPC-H-ish schema. */
  val uniqueKeys: TrieMap[String, Unit] = TrieMap(
    Seq("n_nationkey", "r_regionkey", "c_custkey", "s_suppkey",
      "p_partkey", "o_orderkey").map(_ -> ()): _*)

  /** fk column name -> referenced unique key column name (RELY; fk may
    * be null — elimination inserts IS NOT NULL). */
  val foreignKeys: TrieMap[String, String] = TrieMap(
    "l_orderkey" -> "o_orderkey",
    "l_partkey" -> "p_partkey",
    "l_suppkey" -> "s_suppkey",
    "o_custkey" -> "c_custkey",
    "c_nationkey" -> "n_nationkey",
    "s_nationkey" -> "n_nationkey",
    "n_regionkey" -> "r_regionkey")

  def declareUnique(col: String): Unit = uniqueKeys.put(col.toLowerCase, ())
  def declareForeignKey(fk: String, pk: String): Unit = {
    foreignKeys.put(fk.toLowerCase, pk.toLowerCase)
    uniqueKeys.put(pk.toLowerCase, ())
  }
}

class FkJoinEliminationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** parent side must be (Project over)? (IsNotNull-only Filter over)?
    * a leaf scan that natively outputs `key`. */
  private def isBareKeyScan(plan: LogicalPlan, key: Attribute): Boolean = plan match {
    case Project(projectList, child) =>
      projectList.forall {
        case a: Attribute => true
        case Alias(a: Attribute, _) => true
        case _ => false
      } && isBareKeyScan(child, key)
    case Filter(cond, child) =>
      splitConjuncts(cond).forall {
        case IsNotNull(a: Attribute) => a.semanticEquals(key)
        case _ => false
      } && isBareKeyScan(child, key)
    case l: LeafNode => l.output.exists(_.semanticEquals(key))
    case _ => false
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** (childKey, parentKey) when cond is a single equi on the pair. */
  private def keyPair(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Attribute, Attribute, LogicalPlan, LogicalPlan)] =
    cond match {
      case EqualTo(a: Attribute, b: Attribute) =>
        if (left.outputSet.contains(a) && right.outputSet.contains(b))
          Some((a, b, left, right))
        else if (left.outputSet.contains(b) && right.outputSet.contains(a))
          Some((b, a, left, right))
        else None
      case _ => None
    }

  private def eliminate(used: Seq[Expression], j: Join): Option[LogicalPlan] = {
    val refs = used.flatMap(_.references)
    def parentUnused(parent: LogicalPlan) =
      !refs.exists(parent.outputSet.contains)
    j match {
      case Join(l, r, Inner, Some(cond), _) =>
        keyPair(cond, l, r).flatMap { case (ck0, pk0, _, _) =>
          // orient: which side is the declared parent?
          val oriented = Seq((ck0, pk0, l, r), (pk0, ck0, r, l))
          oriented.collectFirst {
            case (ck, pk, child, parent)
                if Constraints.foreignKeys.get(ck.name.toLowerCase)
                     .contains(pk.name.toLowerCase) &&
                   Constraints.uniqueKeys.contains(pk.name.toLowerCase) &&
                   parentUnused(parent) && isBareKeyScan(parent, pk) =>
              Filter(IsNotNull(ck), child)
          }
        }
      case Join(l, r, LeftOuter, Some(cond), _) =>
        keyPair(cond, l, r).flatMap { case (a, b, _, _) =>
          // parent must be the right (preserved-null) side
          val (ck, pk) =
            if (r.outputSet.contains(b)) (a, b) else (b, a)
          if (r.outputSet.contains(pk) &&
              Constraints.uniqueKeys.contains(pk.name.toLowerCase) &&
              parentUnused(r) && isBareKeyScan(r, pk))
            Some(l)
          else None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(plist, j: Join) =>
      eliminate(plist, j).map(Project(plist, _)).getOrElse(p)
    case a @ Aggregate(gexprs, aexprs, j: Join, _) =>
      eliminate(gexprs ++ aexprs, j)
        .map(nc => a.copy(child = nc)).getOrElse(a)
  }
}
