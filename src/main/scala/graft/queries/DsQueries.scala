package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** TPC-DS-shaped pattern battery (SURVEY.md §5.2 "representative
  * TPC-DS subset"; reference suites regression-test/suites/
  * tpcds_sf1_p1/, nereids_tpcds_p0/). Patterns: channel union,
  * year-over-year window ratio, rank-with-ties per group, correlated
  * scalar subquery, CASE pivot, and multi-period EXISTS.
  */
object DsQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(
    "ds_channel_union" -> """
      SELECT yr, channel, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sales
      FROM (
        SELECT year(o_orderdate) AS yr, 'open' AS channel, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
        UNION ALL
        SELECT year(o_orderdate), 'closed', o_totalprice
        FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT year(o_orderdate), 'pending', o_totalprice
        FROM orders WHERE o_orderstatus = 'P') c
      GROUP BY yr, channel ORDER BY yr, channel""",

    "ds_yoy_ratio" -> """
      WITH yearly AS (
        SELECT year(o_orderdate) AS yr,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sales
        FROM orders GROUP BY year(o_orderdate))
      SELECT yr, sales,
             round(sales / lag(sales) OVER (ORDER BY yr), 6) AS yoy
      FROM yearly ORDER BY yr""",

    "ds_rank_ties" -> """
      SELECT * FROM (
        SELECT o_orderpriority,
               CAST(floor(o_totalprice) AS INT) % 1000 AS price_band,
               rank() OVER (PARTITION BY o_orderpriority
                            ORDER BY CAST(floor(o_totalprice) AS INT) % 1000) AS rk
        FROM orders WHERE o_orderkey < 2000) x
      WHERE rk <= 5 ORDER BY o_orderpriority, rk, price_band""",

    "ds_scalar_subquery" -> """
      SELECT c_mktsegment, count(*) AS n_above
      FROM customer c
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                         FROM customer WHERE c_mktsegment = c.c_mktsegment)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "ds_case_pivot" -> """
      SELECT l_returnflag,
             CAST(count_if(month(l_shipdate) <= 3) AS BIGINT) AS q1_cnt,
             CAST(count_if(month(l_shipdate) BETWEEN 4 AND 6) AS BIGINT) AS q2_cnt,
             CAST(count_if(month(l_shipdate) BETWEEN 7 AND 9) AS BIGINT) AS q3_cnt,
             CAST(count_if(month(l_shipdate) >= 10) AS BIGINT) AS q4_cnt,
             CAST(SUM(CASE WHEN month(l_shipdate) <= 6
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS h1_sales
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "ds_multi_period_exists" -> """
      SELECT c_mktsegment, count(*) AS n FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1996)
        AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND year(o.o_orderdate) = 1997)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
