package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge-percentile-to-array (plans/MergePercentile.scala): the opt-in
  * fuse of N exact percentiles over one column into a single
  * array-percentile buffer must change the plan and NEVER the values. */
class MergePercentileSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.mergePercentile.enabled", "true")
    try f finally spark.conf.set("spark.graft.mergePercentile.enabled", "false")
  }

  private def li: DataFrame = Tables.load(spark, sf, "lineitem")

  test("fires on sibling percentiles, one buffer per column, values identical") {
    def q = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.25)").as("ep25"),
        expr("percentile(l_extendedprice, 0.75)").as("ep75"),
        sum(col("l_quantity")).as("sq"))
      .orderBy(col("l_returnflag"))
    val plain = q.collect().toSeq
    val (plan, rows) = withRule {
      (q.queryExecution.optimizedPlan.toString, q.collect().toSeq)
    }
    assert(plan.contains("__pm_arr0") && plan.contains("__pm_arr1"),
      s"expected two merged buffers (one per column):\n$plan")
    assert("percentile\\(".r.findAllIn(plan.toLowerCase).size <= 2,
      s"unmerged percentile calls remain:\n$plan")
    assert(rows == plain)
  }

  test("percentiles under scalar wrappers (round) merge and agree") {
    def q = li.groupBy(col("l_linestatus"))
      .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.99)"), 6).as("p99"))
      .orderBy(col("l_linestatus"))
    val plain = q.collect().toSeq
    val (plan, rows) = withRule {
      (q.queryExecution.optimizedPlan.toString, q.collect().toSeq)
    }
    assert(plan.contains("__pm_arr"), s"did not fire under round():\n$plan")
    assert(rows == plain)
  }

  test("never fires when disabled, on a single percentile, or on approx percentiles") {
    def planOf(df: DataFrame) = df.queryExecution.optimizedPlan.toString
    val two = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("a"),
        expr("percentile(l_quantity, 0.9)").as("b"))
    assert(!planOf(two).contains("__pm_arr"), "fired while disabled")
    withRule {
      val one = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("a"), count(lit(1)).as("n"))
      assert(!planOf(one).contains("__pm_arr"), "fired on a single percentile")
      val approx = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(l_quantity, 0.5, 100)").as("a"),
          expr("percentile_approx(l_quantity, 0.9, 100)").as("b"))
      assert(!planOf(approx).contains("__pm_arr"), "fired on percentile_approx")
      val differentCols = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("a"),
          expr("percentile(l_extendedprice, 0.9)").as("b"))
      assert(!planOf(differentCols).contains("__pm_arr"),
        "merged across different columns")
    }
  }
}
