package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MaterializedViews

/** Asserts the transparent MV rewrite actually fires (plan-shape test,
  * SURVEY.md §5 "plan-shape tests" analog of suites/shape_check/). */
class MvSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("eligible aggregate is rewritten to the MV scan") {
    val p = planOf("mv_rewrite_hit")
    assert(p.contains("mv_lineitem_rf_ls"), s"MV not used:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
  }

  test("filtered MV consumed when query filter matches definition") {
    val p = planOf("mv_rewrite_filtered")
    assert(p.contains("mv_li_flag_a"), s"filtered MV not used:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
  }

  test("ineligible aggregate stays on the base table") {
    val p = planOf("mv_rewrite_miss")
    assert(!p.contains("mv_lineitem_rf_ls"), s"MV wrongly used:\n$p")
  }

  test("rewrite preserves results vs MV-less run") {
    val withMv = SparkEntry.queries("mv_rewrite_hit")(spark, sf).collect().toSeq
    MaterializedViews.drop("mv_lineitem_rf_ls")
    try {
      val without = Tables.load(spark, sf, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"),
          round(avg(col("l_quantity")), 4).as("aq"))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(withMv == without)
    } finally {
      // re-register for any later test
      MaterializedViews.create(spark, "mv_lineitem_rf_ls", sf, "lineitem",
        groupCols = Seq("l_returnflag", "l_linestatus"),
        sumCols = Seq("l_quantity"),
        minCols = Seq("l_extendedprice"), maxCols = Seq("l_extendedprice"))
    }
  }
}
