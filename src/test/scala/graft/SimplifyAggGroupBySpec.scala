package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group-key simplification (plans/SimplifyAggGroupBy.scala): derived
  * keys must leave the grouping list without changing values; keys
  * over non-group columns must stay. */
class SimplifyAggGroupBySpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.simplifyAggGroupBy.enabled", "true")
    try f finally spark.conf.set("spark.graft.simplifyAggGroupBy.enabled", "false")
  }

  private def groupSizes(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.groupingExpressions.size
    }

  test("derived date parts leave the grouping, values identical") {
    def q = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderdate"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(round(sum(col("o_totalprice")), 6).as("sp"), count(lit(1)).as("n"))
      .orderBy(col("o_orderdate"))
    val plain = q.collect().toSeq
    val (sizes, simplified, schema) =
      withRule { (groupSizes(q), q.collect().toSeq, q.schema) }
    assert(sizes == Seq(1), s"expected single surviving key, got $sizes")
    assert(simplified == plain)
    assert(schema == q.schema)
  }

  test("view-aliased base: re-inlined key rebases onto the surviving alias") {
    // cb_q32 regression: the view renames the base column
    // (event_id AS WatchID) and derives a second key from the SAME base
    // ((event_id*7919)%100000 AS ClientIP). The bare base is pruned
    // from the Project, so the dropped key's definition must be
    // rewritten onto the surviving alias or the plan fails to bind.
    Tables.registerAll(spark, sf)
    def q = spark.sql("""
      WITH v AS (SELECT event_id AS WatchID,
                        CAST((event_id * 7919) % 100000 AS INT) AS ClientIP,
                        value FROM events)
      SELECT WatchID, ClientIP, COUNT(*) AS c, ROUND(SUM(value), 6) AS sv
      FROM v GROUP BY WatchID, ClientIP
      ORDER BY c DESC, WatchID LIMIT 10""")
    val plain = q.collect().toSeq
    val (sizes, simplified) = withRule { (groupSizes(q), q.collect().toSeq) }
    assert(sizes == Seq(1), s"expected single surviving key, got $sizes")
    assert(simplified == plain)
  }

  test("expression over a NON-group column keeps its key") {
    def q = Tables.load(spark, sf, "orders")
      .groupBy(col("o_orderstatus"),
        (col("o_custkey") % 7).as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("b"))
    val plain = q.collect().toSeq
    val (sizes, res) = withRule { (groupSizes(q), q.collect().toSeq) }
    assert(sizes == Seq(2), s"must not drop a key over a non-group column: $sizes")
    assert(res == plain)
  }

  test("composite: f(k) over one of several base keys is dropped") {
    def q = Tables.load(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("tag"))
      .agg(round(sum(col("l_quantity")), 6).as("sq"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    val plain = q.collect().toSeq
    val (sizes, res) = withRule { (groupSizes(q), q.collect().toSeq) }
    assert(sizes == Seq(2), s"derived tag should be dropped: $sizes")
    assert(res == plain)
  }

  test("rollup shapes are untouched") {
    def q = Tables.load(spark, sf, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    val plain = q.collect().toSeq
    val res = withRule { q.collect().toSeq }
    assert(res == plain)
  }
}
