package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Eager aggregation (plans/EagerAgg.scala): the opt-in partial-agg
  * push below an inner join must change the plan and NEVER the values. */
class EagerAggSpec extends AnyFunSuite {
  import TestSpark._

  private def withEager[T](f: => T): T = {
    spark.conf.set("spark.graft.eagerAgg.enabled", "true")
    try f finally spark.conf.set("spark.graft.eagerAgg.enabled", "false")
  }

  private def joined: DataFrame =
    Tables.load(spark, sf, "lineitem")
      .join(Tables.load(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))

  test("fires on the canonical shape and values are identical") {
    val q = joined.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_linenumber").cast("long")).as("sl"),
        min(col("l_quantity")).as("mnq"), max(col("l_quantity")).as("mxq"))
      .orderBy(col("o_orderpriority"))
    val plainRows = q.collect().toSeq
    val (eagerPlan, eagerRows) = withEager {
      val q2 = joined.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("l_linenumber").cast("long")).as("sl"),
          min(col("l_quantity")).as("mnq"), max(col("l_quantity")).as("mxq"))
        .orderBy(col("o_orderpriority"))
      (q2.queryExecution.optimizedPlan.toString, q2.collect().toSeq)
    }
    assert(eagerPlan.contains("__eager_p_"), s"did not fire:\n$eagerPlan")
    assert(eagerRows == plainRows)
  }

  test("group key on the aggregate side also fires and agrees") {
    def q = joined.groupBy(col("l_returnflag"), col("o_orderstatus"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"))
      .orderBy(col("l_returnflag"), col("o_orderstatus"))
    val plain = q.collect().toSeq
    val (p, rows) = withEager {
      (q.queryExecution.optimizedPlan.toString, q.collect().toSeq)
    }
    assert(p.contains("__eager_p_"), s"did not fire:\n$p")
    assert(rows == plain)
  }

  test("never fires when disabled, on distinct aggs, decimal sums, or outer joins") {
    def planOf(df: DataFrame) = df.queryExecution.optimizedPlan.toString
    val base = joined.groupBy(col("o_orderpriority"))
      .agg(sum(col("l_linenumber").cast("long")).as("sl"))
    assert(!planOf(base).contains("__eager_p_"), "fired while disabled")
    withEager {
      val distinctAgg = joined.groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("l_partkey")).as("nd"))
      assert(!planOf(distinctAgg).contains("__eager_p_"), "fired on DISTINCT")
      val decimalSum = joined.groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("sq"))
      assert(!planOf(decimalSum).contains("__eager_p_"), "fired on DECIMAL sum")
      val outer = Tables.load(spark, sf, "orders")
        .join(Tables.load(spark, sf, "lineitem"),
          col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_linenumber").cast("long")).as("sl"))
      assert(!planOf(outer).contains("__eager_p_"), "fired on LEFT join")
    }
  }
}
