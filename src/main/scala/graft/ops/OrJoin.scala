package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OR-expansion for disjunctive equi-joins (reference:
  * fe/fe-core/.../nereids/rules/rewrite/OrExpansion.java — SURVEY.md
  * §4.1's "OR-expansion to union" row).
  *
  * `l JOIN r ON e1 OR e2 OR ... OR ek` plans as a nested-loop join in
  * Spark (no single equi key), which is O(|l|·|r|) — a scale-killer
  * when both sides are facts. The expansion rewrites it into a union
  * of k hash joins, branch i joining on e_i with the exclusion filter
  * NOT coalesce(e_j, false) for all j < i, so every qualifying row
  * pair appears exactly once (rows matching several disjuncts are
  * claimed by the first): semantics are identical to the OR join,
  * including null behavior (a null disjunct never matches).
  *
  * Each branch is a plain equi hash join (the exclusion filters ride
  * as post-join predicates), so the plan is k shuffles/broadcasts
  * instead of one cartesian — the reference applies the same rewrite
  * under its CBO. The analyzer deduplicates the shared relation ids
  * across union branches.
  */
object OrJoin {

  /** Inner join of `left` and `right` on the disjunction of `conds`,
    * expanded into a union of equi joins. Caller guarantees each cond
    * is an equi predicate usable as a hash-join key. */
  def expand(left: DataFrame, right: DataFrame, conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "at least one join disjunct")
    conds.zipWithIndex.map { case (c, i) =>
      val exclusion = conds.take(i)
        .map(p => !coalesce(p, lit(false)))
        .reduceOption(_ && _)
      val cond = exclusion.fold(c)(c && _)
      left.join(right, cond, "inner")
    }.reduce(_ unionAll _)
  }
}
