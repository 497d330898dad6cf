package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** plans/UnequalInfer.scala: transitive range inference through
  * non-equi comparison chains (reference UnequalPredicateInfer.java).
  * Fires on the chain shape, keeps values identical, respects
  * strictness, and refuses outer joins / mixed types. */
class UnequalInferSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T =
    graft.queries.Q.withFlag(spark, "spark.graft.unequalInfer.enabled")(f)

  private def li = Tables.load(spark, sf, "lineitem")
  private def ord = Tables.load(spark, sf, "orders")

  /** optimized-plan Filters carrying a literal bound on the column */
  private def boundsOn(df: DataFrame, colName: String): Seq[String] =
    df.queryExecution.optimizedPlan.collect { case Filter(c, _) =>
      c.collect {
        case e @ LessThan(a, l) if l.foldable &&
          a.references.map(_.name).toSeq == Seq(colName) => e.sql
        case e @ LessThanOrEqual(a, l) if l.foldable &&
          a.references.map(_.name).toSeq == Seq(colName) => e.sql
        case e @ GreaterThan(a, l) if l.foldable &&
          a.references.map(_.name).toSeq == Seq(colName) => e.sql
        case e @ GreaterThanOrEqual(a, l) if l.foldable &&
          a.references.map(_.name).toSeq == Seq(colName) => e.sql
      }
    }.flatten

  private def chainQuery(joinType: String) = {
    val j = li.as("l").join(ord.as("o"),
      col("l.l_orderkey") === col("o.o_orderkey") &&
        col("l.l_shipdate") > col("o.o_orderdate"), joinType)
    j.filter(col("o.o_orderdate") > lit("1997-06-01").cast("timestamp_ntz"))
      .groupBy(col("l.l_returnflag")).agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  test("non-equi chain derives the fact-side bound; values identical") {
    def q = chainQuery("inner")
    val plain = q.collect().toSeq
    assert(boundsOn(q, "l_shipdate").isEmpty,
      "premise broken — native Spark already infers the non-equi bound")
    val (bounds, rows) = withRule { (boundsOn(q, "l_shipdate"), q.collect().toSeq) }
    assert(bounds.exists(_.contains(">")),
      s"no derived l_shipdate bound in the optimized plan: $bounds")
    assert(rows == plain, "values changed with unequalInfer on")
  }

  test("strictness: a <= chain derives <=, never <") {
    // l_quantity <= l_extendedprice is type-mismatched; build the chain
    // on one table through a self-join instead: l1.qty <= l2.qty AND
    // l2.qty <= 10 => l1.qty <= 10 (non-strict end to end)
    def q = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_linenumber") === col("b.l_linenumber") &&
          col("a.l_quantity") <= col("b.l_quantity"))
      .filter(col("b.l_quantity") <= lit(10.0))
      .agg(count(lit(1)).as("n"))
    val plain = q.collect().toSeq
    val (bounds, rows) = withRule { (boundsOn(q, "l_quantity"), q.collect().toSeq) }
    // derived bound must exist and be non-strict (SQL renders <=)
    assert(bounds.nonEmpty, "no derived bound")
    assert(bounds.forall(b => !b.contains("< 10") || b.contains("<= 10")),
      s"a <=-only chain must not tighten to strict <: $bounds")
    assert(rows == plain)
  }

  test("outer joins are excluded (filtering a preserved side drops rows)") {
    // the bound lives INSIDE the join condition so the left join
    // survives optimization (a null-rejecting filter ABOVE it would be
    // converted to inner by native EliminateOuterJoin — where firing is
    // legitimate); deriving l_shipdate > cutoff onto the preserved left
    // side here would drop preserved rows
    def q = li.as("l").join(ord.as("o"),
        col("l.l_orderkey") === col("o.o_orderkey") &&
          col("l.l_shipdate") > col("o.o_orderdate") &&
          col("o.o_orderdate") > lit("1997-06-01").cast("timestamp_ntz"),
        "left_outer")
      .groupBy(col("l.l_returnflag")).agg(count(col("o.o_orderkey")).as("n"))
      .orderBy(col("l_returnflag"))
    val plain = q.collect().toSeq
    val (bounds, rows) = withRule { (boundsOn(q, "l_shipdate"), q.collect().toSeq) }
    assert(bounds.isEmpty, s"rule must not fire on an outer join: $bounds")
    assert(rows == plain)
  }

  test("equality edges participate: k = k' and k' < lit implies k < lit") {
    def q = li.as("a").join(ord.as("b"),
        col("a.l_orderkey") === col("b.o_orderkey"))
      .filter(col("b.o_orderkey") < lit(500L))
      .agg(count(lit(1)).as("n"))
    val plain = q.collect().toSeq
    // native InferFiltersFromConstraints already covers equi keys —
    // the rule must simply not break or duplicate it
    val (bounds, rows) = withRule { (boundsOn(q, "l_orderkey"), q.collect().toSeq) }
    assert(bounds.nonEmpty, "equi-derived bound vanished")
    assert(rows == plain)
  }
}
