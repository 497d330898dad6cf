package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-agg-subquery-to-window rewrite (plans/ScalarAggToWindow.scala):
  * the opt-in rule must replace the decorrelated self-join with a
  * single-scan window plan and NEVER change the values. */
class ScalarAggToWindowSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.scalarAggWindow.enabled", "true")
    try f finally spark.conf.set("spark.graft.scalarAggWindow.enabled", "false")
  }

  private def sql(q: String): DataFrame = {
    Tables.registerAll(spark, sf)
    spark.sql(q)
  }

  private val canonical = """
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
    FROM lineitem o
    WHERE l_quantity > 1.5 * (SELECT avg(l_quantity) FROM lineitem i
                              WHERE i.l_partkey = o.l_partkey)
    ORDER BY l_orderkey, l_linenumber"""

  test("fires on the correlated avg shape; single scan; values identical") {
    val plain = sql(canonical).collect().toSeq
    val (plan, rows) = withRule {
      val df = sql(canonical)
      (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
    }
    assert(plan.contains("__saw_w"), s"did not fire:\n$plan")
    assert(!plan.contains("Join"), s"self-join survived:\n$plan")
    // one scan: the relation appears exactly once in the optimized plan
    assert(plan.linesIterator.count(_.contains("Relation")) == 1,
      s"expected a single lineitem scan:\n$plan")
    assert(rows.map(_.toString).sorted == plain.map(_.toString).sorted)
    assert(rows.nonEmpty)
  }

  test("multi-aggregate alias expressions fire and agree") {
    val q = """
      SELECT l_orderkey, l_quantity
      FROM lineitem o
      WHERE l_quantity > (SELECT (min(l_quantity) + max(l_quantity)) / 2
                          FROM lineitem i WHERE i.l_partkey = o.l_partkey)
      ORDER BY l_orderkey, l_quantity"""
    val plain = sql(q).collect().toSeq
    val (plan, rows) = withRule {
      val df = sql(q)
      (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
    }
    assert(plan.contains("__saw_w"), s"did not fire:\n$plan")
    assert(rows.map(_.toString).sorted == plain.map(_.toString).sorted)
  }

  test("two-key correlation fires and agrees") {
    val q = """
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem o
      WHERE l_quantity > 1.2 * (SELECT avg(l_quantity) FROM lineitem i
                                WHERE i.l_partkey = o.l_partkey
                                  AND i.l_suppkey = o.l_suppkey)
      ORDER BY l_orderkey, l_linenumber"""
    val plain = sql(q).collect().toSeq
    val (plan, rows) = withRule {
      val df = sql(q)
      (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
    }
    assert(plan.contains("__saw_w"), s"did not fire:\n$plan")
    assert(rows.map(_.toString).sorted == plain.map(_.toString).sorted)
  }

  test("SELECT-list scalar subquery (LEFT OUTER decorrelation) fires and agrees") {
    val q = """
      SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        round((SELECT avg(l_quantity) FROM lineitem i
               WHERE i.l_partkey = o.l_partkey), 6) AS pavg
      FROM lineitem o
      ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity"""
    val plain = sql(q).collect().toSeq
    val (plan, rows) = withRule {
      val df = sql(q)
      (df.queryExecution.optimizedPlan.toString, df.collect().toSeq)
    }
    assert(plan.contains("__saw_w"), s"did not fire on LEFT OUTER:\n$plan")
    assert(!plan.contains("Join"), s"self-join survived:\n$plan")
    assert(rows == plain)
    assert(rows.nonEmpty)
  }

  test("SELECT-list subquery with an extra outer filter bails (row sets differ)") {
    withRule {
      val q = """
        SELECT l_orderkey,
          (SELECT avg(l_quantity) FROM lineitem i
           WHERE i.l_partkey = o.l_partkey) AS pavg
        FROM lineitem o WHERE l_orderkey < 100"""
      val plan = sql(q).queryExecution.optimizedPlan.toString
      assert(!plan.contains("__saw_w"),
        s"fired although the outer scan is filtered and the subquery is not:\n$plan")
    }
  }

  test("never fires when disabled, on count (count-bug family), on distinct, " +
      "or when the subquery scans a DIFFERENT table") {
    def planOf(q: String) = sql(q).queryExecution.optimizedPlan.toString
    assert(!planOf(canonical).contains("__saw_w"), "fired while disabled")
    withRule {
      val count = """
        SELECT l_orderkey FROM lineitem o
        WHERE l_linenumber > (SELECT count(*) FROM lineitem i
                              WHERE i.l_partkey = o.l_partkey)"""
      assert(!planOf(count).contains("__saw_w"), "fired on COUNT(*)")
      val distinct = """
        SELECT l_orderkey FROM lineitem o
        WHERE l_quantity > (SELECT avg(DISTINCT l_quantity) FROM lineitem i
                            WHERE i.l_partkey = o.l_partkey)"""
      assert(!planOf(distinct).contains("__saw_w"), "fired on DISTINCT")
      val otherTable = """
        SELECT o_orderkey FROM orders o
        WHERE o_totalprice > (SELECT avg(l_extendedprice) FROM lineitem i
                              WHERE i.l_orderkey = o.o_orderkey)"""
      assert(!planOf(otherTable).contains("__saw_w"), "fired across tables")
      // different filters on the two scans of the SAME table must bail:
      // the aggregate would range over a different row set
      val filtered = """
        SELECT l_orderkey FROM lineitem o
        WHERE l_returnflag = 'R'
          AND l_quantity > (SELECT avg(l_quantity) FROM lineitem i
                            WHERE i.l_partkey = o.l_partkey
                              AND i.l_linestatus = 'F')"""
      assert(!planOf(filtered).contains("__saw_w"), "fired on mismatched filters")
    }
  }
}
