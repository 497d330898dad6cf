package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.scalatest.funsuite.AnyFunSuite

/** Pull-up-join-from-union-all (plans/PullUpUnionJoin.scala): the
  * opt-in distribution of a shared inner join over UNION ALL must
  * collapse to ONE join and NEVER change values. */
class PullUpUnionJoinSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.pullUpUnionJoin.enabled", "true")
    try f finally spark.conf.set("spark.graft.pullUpUnionJoin.enabled", "false")
  }

  private def sql(q: String): DataFrame = {
    Tables.registerAll(spark, sf)
    spark.sql(q)
  }

  private def nJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private val shared = """
    SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > 5000
    UNION ALL
    SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal < -500
    ORDER BY n_name, s_name"""

  test("collapses two shared-side joins into one; values identical") {
    val plain = sql(shared).collect().toSeq
    assert(nJoins(sql(shared)) == 2, "expected two joins without the rule")
    val (n, rows) = withRule { (nJoins(sql(shared)), sql(shared).collect().toSeq) }
    assert(n == 1, "joins did not collapse")
    assert(rows == plain)
    assert(rows.nonEmpty)
  }

  test("three branches collapse too") {
    val q = """
      SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal > 5000
      UNION ALL
      SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal < -500
      UNION ALL
      SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_name LIKE '%007%'
      ORDER BY n_name, s_name"""
    val plain = sql(q).collect().toSeq
    val (n, rows) = withRule { (nJoins(sql(q)), sql(q).collect().toSeq) }
    assert(n == 1, "three branches did not collapse")
    assert(rows == plain)
  }

  test("never fires when disabled, on different right sides, different keys, or outer joins") {
    assert(withRule { true })
    assert(nJoins(sql(shared)) == 2, "fired while disabled")
    withRule {
      // right-side columns are consumed so FK-join elimination cannot
      // remove the joins first (see InferSetOpDistinctSpec for the
      // composition note)
      val differentRight = """
        SELECT n_name AS x, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        UNION ALL
        SELECT r_name AS x, c_name FROM customer JOIN region ON c_nationkey = r_regionkey"""
      assert(nJoins(sql(differentRight)) == 2, "fired on different right sides")
      val differentKeys = """
        SELECT n_name, s_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
        UNION ALL
        SELECT n_name, s_name FROM supplier JOIN nation ON CAST(s_suppkey AS INT) = n_nationkey"""
      assert(nJoins(sql(differentKeys)) == 2, "fired on different join keys")
      val outer = """
        SELECT n_name, s_name FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal > 5000
        UNION ALL
        SELECT n_name, s_name FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        WHERE s_acctbal < -500"""
      assert(nJoins(sql(outer)) == 2, "fired on outer joins")
    }
  }
}
