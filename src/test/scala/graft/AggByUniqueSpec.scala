package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate elimination over a RELY-unique group key
  * (plans/AggByUnique.scala): the opt-in collapse to a stateless
  * projection must only fire when every group is provably one row —
  * and must never change values or output types. */
class AggByUniqueSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.aggByUnique.enabled", "true")
    try f finally spark.conf.set("spark.graft.aggByUnique.enabled", "false")
  }

  private def orders: DataFrame = Tables.load(spark, sf, "orders")
  private def hasAgg(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.toString.contains("Aggregate")

  test("fires on GROUP BY pk; aggregate gone; values and schema identical") {
    def q = orders.groupBy(col("o_orderkey"))
      .agg(sum(col("o_totalprice")).as("total"), count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("np"),
        min(col("o_orderdate")).as("d"),
        avg(col("o_custkey")).as("ac"))
      .orderBy(col("o_orderkey"))
    val plain = q.collect().toSeq
    val plainSchema = q.schema
    val (fired, rows, schema) = withRule { (!hasAgg(q), q.collect().toSeq, q.schema) }
    assert(fired, "aggregate survived")
    assert(schema == plainSchema, "output types changed")
    assert(rows == plain)
    assert(rows.nonEmpty)
  }

  test("never fires when disabled, on non-unique keys, through joins, " +
      "on DISTINCT, or on decimal sums") {
    assert(withRule { true })
    assert(hasAgg(orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))),
      "fired while disabled")
    withRule {
      val li = Tables.load(spark, sf, "lineitem")
      assert(hasAgg(li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))),
        "fired on a non-unique key")
      val joined = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      assert(hasAgg(joined), "fired through a duplicating join")
      assert(hasAgg(orders.groupBy(col("o_orderkey"))
        .agg(countDistinct(col("o_orderpriority")).as("nd"))),
        "fired on DISTINCT")
      assert(hasAgg(orders.groupBy(col("o_orderkey"))
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s"))),
        "fired on a decimal sum")
    }
  }
}
