package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.MaterializedViews
import Q._

/** Materialized-view battery. Correctness here is rewrite-independent
  * (the rule must never change results); MvSpec asserts the rewrite
  * actually fires by inspecting the physical plan's scan paths.
  */
object MvQueries {

  private def ensureMv(s: SparkSession, dir: String): Unit =
    MaterializedViews.create(s, "mv_lineitem_rf_ls", dir, "lineitem",
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_quantity"),
      minCols = Seq("l_extendedprice"),
      maxCols = Seq("l_extendedprice"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eligible: rewritten to the MV scan (asserted in MvSpec).
    "mv_rewrite_hit" -> ((s, dir) => {
      ensureMv(s, dir)
      t(s, dir, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"),
          round(avg(col("l_quantity")), 4).as("aq"))
        .orderBy(col("l_returnflag"))
    }),

    // filtered MV: the query's filter textually matches the MV's
    // definition filter and is consumed by the rewrite.
    "mv_rewrite_filtered" -> ((s, dir) => {
      MaterializedViews.create(s, "mv_li_flag_a", dir, "lineitem",
        groupCols = Seq("l_suppkey"), sumCols = Seq("l_quantity"),
        filterSql = Some("l_returnflag = 'A'"))
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A")
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"), count(lit(1)).as("n"))
        .orderBy(col("l_suppkey"))
    }),

    // ineligible (distinct agg): must stay on the base table.
    "mv_rewrite_miss" -> ((s, dir) => {
      ensureMv(s, dir)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("nd"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    })
  )

  def oracle: Map[String, String] = Map(
    "mv_rewrite_hit" -> """
      SELECT l_returnflag, round(sum(l_quantity), 2) AS sq, count(*) AS n,
             min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
             round(avg(l_quantity), 4) AS aq
      FROM lineitem WHERE l_linestatus = 'F'
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "mv_rewrite_filtered" -> """
      SELECT l_suppkey, round(sum(l_quantity), 2) AS sq, count(*) AS n
      FROM lineitem WHERE l_returnflag = 'A'
      GROUP BY l_suppkey ORDER BY l_suppkey""",

    "mv_rewrite_miss" -> """
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS nd, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
