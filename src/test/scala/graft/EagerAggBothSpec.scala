package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Double-eager aggregation (plans/EagerAggBoth.scala): partial aggs on
  * BOTH join inputs with multiplicity restored via per-group counts —
  * must change the plan and NEVER the values. */
class EagerAggBothSpec extends AnyFunSuite {
  import TestSpark._

  private def withBoth[T](f: => T): T = {
    spark.conf.set("spark.graft.eagerAggBoth.enabled", "true")
    try f finally spark.conf.set("spark.graft.eagerAggBoth.enabled", "false")
  }

  private def joined: DataFrame =
    Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders"), col("c_custkey") === col("o_custkey"))

  private def canonical: DataFrame =
    joined.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_nationkey").cast("long")).as("sl"),
        sum(month(col("o_orderdate")).cast("long")).as("sr"),
        min(col("o_totalprice")).as("mnp"),
        max(col("c_acctbal")).as("mxb"))
      .orderBy(col("c_mktsegment"))

  test("fires on both sides and values are identical") {
    val plain = canonical.collect().toSeq
    val (optPlan, rows) = withBoth {
      (canonical.queryExecution.optimizedPlan, canonical.collect().toSeq)
    }
    // strict structural law (flag isolated here): a partial aggregate
    // with the rule's marker sits below the join on BOTH inputs
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val pushedBelowJoin = optPlan.collect { case j: Join =>
      Seq(j.left, j.right).flatMap(_.collectFirst {
        case a: Aggregate
            if a.aggregateExpressions.exists(_.name.startsWith("__eager2_p_")) => a
      }).size
    }.sum
    assert(pushedBelowJoin == 2, s"did not fire on both sides:\n$optPlan")
    assert(rows == plain)
  }

  test("empty-input groups: count semantics survive the count-product rewrite") {
    // restrict the right side so some customers have zero matches —
    // inner-join groups that vanish must vanish identically
    def q = Tables.load(spark, sf, "customer")
      .join(Tables.load(spark, sf, "orders").filter(col("o_orderkey") % 7 === 0),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_custkey").cast("long")).as("sc"),
        count(col("o_orderkey")).as("co"))
      .orderBy(col("c_nationkey"))
    val plain = q.collect().toSeq
    val (plan, rows) = withBoth {
      (q.queryExecution.optimizedPlan.toString, q.collect().toSeq)
    }
    assert(plan.contains("__eager2_p_"), s"did not fire:\n$plan")
    assert(rows == plain)
  }

  test("no-fire guards: disabled, one-sided aggs, double sums, cross-side agg, outer join, distinct") {
    def planOf(df: DataFrame) = df.queryExecution.optimizedPlan.toString
    assert(!planOf(canonical).contains("__eager2_p_"), "fired while disabled")
    withBoth {
      val oneSided = joined.groupBy(col("c_mktsegment"))
        .agg(sum(col("c_nationkey").cast("long")).as("sl"))
      assert(!planOf(oneSided).contains("__eager2_p_"),
        "fired on a one-sided aggregate list (EagerAggRule territory)")
      val doubleSum = joined.groupBy(col("c_mktsegment"))
        .agg(sum(col("c_acctbal")).as("sb"),
          sum(month(col("o_orderdate")).cast("long")).as("sr"))
      assert(!planOf(doubleSum).contains("__eager2_p_"),
        "fired on a floating-point SUM (reassociation changes rounding)")
      val crossSide = joined.groupBy(col("c_mktsegment"))
        .agg(sum((col("c_nationkey") + col("o_orderkey")).cast("long")).as("sx"),
          count(col("o_orderkey")).as("co"))
      assert(!planOf(crossSide).contains("__eager2_p_"),
        "fired on an aggregate referencing both sides")
      val outer = Tables.load(spark, sf, "customer")
        .join(Tables.load(spark, sf, "orders"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("c_nationkey").cast("long")).as("sl"),
          count(col("o_orderkey")).as("co"))
      assert(!planOf(outer).contains("__eager2_p_"), "fired on an outer join")
      val distinctAgg = joined.groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_custkey")).as("nd"),
          count(col("o_orderkey")).as("co"))
      assert(!planOf(distinctAgg).contains("__eager2_p_"), "fired on DISTINCT")
    }
  }
}
