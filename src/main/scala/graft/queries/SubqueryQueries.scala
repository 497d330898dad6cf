package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** Subquery decorrelation battery (reference: nereids rewrite rules
  * ExistsApplyToJoin/InApplyToJoin/ScalarApplyToJoin,
  * UnCorrelatedApply*.java — Catalyst's DecorrelateInnerQuery handles
  * all of these; the queries pin the semantics).
  */
object SubqueryQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(
    // LATERAL: top-2 orders per high-balance customer.
    "sq_lateral_topn" -> """
      SELECT c.c_custkey, o.o_orderkey, o.rnk
      FROM customer c,
      LATERAL (SELECT o_orderkey,
                      row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rnk
               FROM orders WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
      WHERE c.c_acctbal > 9500
      ORDER BY c.c_custkey, o.rnk""",

    "sq_not_exists" -> """
      SELECT c_mktsegment, count(*) AS n
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 100000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    // correlated IN: customers whose nation had a supplier with
    // matching account-balance band.
    "sq_in_correlated" -> """
      SELECT c_nationkey, count(*) AS n
      FROM customer c
      WHERE CAST(floor(c_acctbal / 1000) AS BIGINT) IN
            (SELECT CAST(floor(s_acctbal / 1000) AS BIGINT) FROM supplier s
             WHERE s.s_nationkey = c.c_nationkey)
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    // scalar subquery in SELECT list (per-row correlated count).
    "sq_scalar_select" -> """
      SELECT n_nationkey, n_name,
             (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS n_cust,
             (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS n_supp
      FROM nation ORDER BY n_nationkey"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
