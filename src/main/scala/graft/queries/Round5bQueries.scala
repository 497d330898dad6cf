package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-5 TPC-DS widening (VERDICT r4 item 3): the q14/q23/q24-class
  * multi-CTE patterns — cross-channel INTERSECT item sets, HAVING vs
  * scalar-subquery max, two-channel growth comparison, best/worst rank
  * self-join, disjunctive band predicates, above-segment-average
  * returns, horizontal month pivot, period-over-period CTE self-join,
  * banded scalar-subquery rows, INTERSECT/EXCEPT customer-set algebra,
  * rollup lochierarchy ranking, window revenue share. One portable SQL
  * text per pattern runs on BOTH engines (ANSI subset), so the oracle
  * is the same string. Money math stays in DECIMAL until the final
  * DOUBLE cast (cross-engine float parity).
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{1,9,13,14,17,
  * 23,36,38,44,59,66,74,87,98}.sql.
  */
object Round5bQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(
    "ds_cross_channel_intersect" -> """
      WITH ci AS (
        SELECT p_brand FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A' AND year(l_shipdate) BETWEEN 1995 AND 1997
        INTERSECT
        SELECT p_brand FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) BETWEEN 1995 AND 1997
        INTERSECT
        SELECT p_brand FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) BETWEEN 1995 AND 1997),
      sales AS (
        SELECT l_returnflag AS channel, p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS rev,
               count(*) AS n
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) BETWEEN 1995 AND 1997
          AND p_brand IN (SELECT p_brand FROM ci)
        GROUP BY l_returnflag, p_brand)
      SELECT channel, p_brand, rev, n FROM sales
      WHERE rev > (SELECT CAST(avg(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) FROM sales)
      ORDER BY channel, p_brand""",

    "ds_best_customer_frequent" -> """
      WITH max_cust AS (
        SELECT max(tot) AS cmax FROM (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS tot
          FROM orders GROUP BY o_custkey) t),
      best_cust AS (
        SELECT o_custkey FROM orders GROUP BY o_custkey
        HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE)
               > 0.5 * (SELECT cmax FROM max_cust)),
      freq_parts AS (
        SELECT l_partkey FROM lineitem GROUP BY l_partkey
        HAVING count(DISTINCT l_orderkey) > 30)
      SELECT count(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sales
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE year(o_orderdate) = 1996
        AND o_custkey IN (SELECT o_custkey FROM best_cust)
        AND l_partkey IN (SELECT l_partkey FROM freq_parts)""",

    "ds_two_channel_growth" -> """
      WITH yr AS (
        SELECT o_custkey AS ck, year(o_orderdate) AS y,
               CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END
                             AS DECIMAL(16,2))) AS DOUBLE) AS closed_tot,
               CAST(SUM(CAST(CASE WHEN o_orderstatus <> 'F' THEN o_totalprice ELSE 0 END
                             AS DECIMAL(16,2))) AS DOUBLE) AS open_tot
        FROM orders WHERE year(o_orderdate) IN (1995, 1996)
        GROUP BY o_custkey, year(o_orderdate))
      SELECT a.ck AS ck, round(b.closed_tot / a.closed_tot, 6) AS closed_growth,
             round(b.open_tot / a.open_tot, 6) AS open_growth
      FROM yr a JOIN yr b ON a.ck = b.ck AND a.y = 1995 AND b.y = 1996
      WHERE a.closed_tot > 0 AND a.open_tot > 0
        AND b.open_tot / a.open_tot > b.closed_tot / a.closed_tot
      ORDER BY ck""",

    "ds_rank_top_bottom" -> """
      WITH perf AS (
        SELECT l_partkey AS pk,
               round(CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS ad
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5),
      asc_r AS (SELECT pk, rank() OVER (ORDER BY ad, pk) AS rk FROM perf),
      desc_r AS (SELECT pk, rank() OVER (ORDER BY ad DESC, pk) AS rk FROM perf)
      SELECT a.rk AS rnk, p1.p_name AS best, p2.p_name AS worst
      FROM asc_r a JOIN desc_r d ON a.rk = d.rk
      JOIN part p1 ON p1.p_partkey = a.pk JOIN part p2 ON p2.p_partkey = d.pk
      WHERE a.rk <= 10 ORDER BY a.rk""",

    "ds_disjunctive_bands" -> """
      SELECT count(*) AS n,
             round(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
      WHERE (n_name IN ('NATION_1', 'NATION_2') AND l_quantity BETWEEN 1 AND 20
             AND o_orderpriority = '1-URGENT')
         OR (n_name IN ('NATION_3', 'NATION_4') AND l_quantity BETWEEN 21 AND 35
             AND o_orderpriority = '2-HIGH')
         OR (n_name IN ('NATION_5', 'NATION_6') AND l_quantity BETWEEN 36 AND 50
             AND o_orderpriority = '3-MEDIUM')""",

    "ds_returns_above_nation_avg" -> """
      WITH ret AS (
        SELECT o_custkey AS ck, c_nationkey AS nk,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS ret_tot
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag = 'R' GROUP BY o_custkey, c_nationkey)
      SELECT ck, ret_tot FROM ret r1
      WHERE ret_tot > 1.2 * (SELECT CAST(avg(CAST(ret_tot AS DECIMAL(18,4))) AS DOUBLE)
                             FROM ret r2 WHERE r2.nk = r1.nk)
      ORDER BY ret_tot DESC, ck""",

    "ds_monthly_pivot12" -> """
      SELECT n_name,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 1 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m1,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 2 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m2,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 3 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m3,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 4 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m4,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 5 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m5,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 6 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m6,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 7 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m7,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 8 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m8,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 9 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m9,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 10 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m10,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 11 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m11,
             CAST(SUM(CAST(CASE WHEN month(l_shipdate) = 12 THEN l_extendedprice ELSE 0 END AS DECIMAL(16,2))) AS DOUBLE) AS m12
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
      WHERE year(l_shipdate) = 1996
      GROUP BY n_name ORDER BY n_name""",

    "ds_half_year_ratio" -> """
      WITH w AS (
        SELECT n_name, month(o_orderdate) AS m,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS rev
        FROM orders JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
        WHERE year(o_orderdate) = 1996 GROUP BY n_name, month(o_orderdate))
      SELECT a.n_name AS n_name, a.m AS mon, round(b.rev / a.rev, 6) AS mom
      FROM w a JOIN w b ON a.n_name = b.n_name AND b.m = a.m + 6
      WHERE a.m <= 6 ORDER BY n_name, mon""",

    "ds_quantity_band_scalars" -> """
      SELECT
        (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS n1,
        (SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*), 6)
         FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS a1,
        (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS n2,
        (SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*), 6)
         FROM lineitem WHERE l_quantity BETWEEN 11 AND 20) AS a2,
        (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS n3,
        (SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*), 6)
         FROM lineitem WHERE l_quantity BETWEEN 21 AND 30) AS a3,
        (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS n4,
        (SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*), 6)
         FROM lineitem WHERE l_quantity BETWEEN 31 AND 40) AS a4,
        (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS n5,
        (SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*), 6)
         FROM lineitem WHERE l_quantity BETWEEN 41 AND 50) AS a5""",

    "ds_month_intersect" -> """
      SELECT count(*) AS n FROM (
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 2
        INTERSECT
        SELECT o_custkey FROM orders
        WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 3) x""",

    "ds_lochierarchy_rank" -> """
      WITH gm AS (
        SELECT r_name, n_name,
               grouping(r_name) + grouping(n_name) AS lochierarchy,
               grouping(n_name) AS gn,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS rev
        FROM orders JOIN customer ON c_custkey = o_custkey
          JOIN nation ON n_nationkey = c_nationkey
          JOIN region ON r_regionkey = n_regionkey
        GROUP BY ROLLUP(r_name, n_name))
      SELECT lochierarchy, coalesce(r_name, 'ALL') AS region,
             coalesce(n_name, 'ALL') AS nation, rev,
             rank() OVER (PARTITION BY lochierarchy,
                            CASE WHEN gn = 0 THEN r_name END
                          ORDER BY rev DESC) AS rnk
      FROM gm
      ORDER BY lochierarchy DESC, region, rnk, nation""",

    "ds_except_churn" -> """
      SELECT count(*) AS n FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997) x""",

    "ds_having_global_avg" -> """
      WITH s AS (
        SELECT l_returnflag AS channel, year(l_shipdate) AS y,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS rev
        FROM lineitem GROUP BY l_returnflag, year(l_shipdate))
      SELECT channel, y, rev FROM s
      WHERE rev > (SELECT CAST(avg(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) FROM s)
      ORDER BY channel, y""",

    "ds_below_avg_qty" -> """
      WITH a AS (
        SELECT l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS aq
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 4)
      SELECT count(*) AS n_small,
             round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
      FROM lineitem JOIN a ON pk = l_partkey
      WHERE l_quantity < 0.5 * aq""",

    "ds_class_share_window" -> """
      WITH s AS (
        SELECT p_type AS class, p_name AS item,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS rev
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_size <= 3 GROUP BY p_type, p_name)
      SELECT class, item, rev,
             round(rev * 100 / CAST(sum(CAST(rev AS DECIMAL(18,4)))
                                    OVER (PARTITION BY class) AS DOUBLE), 6) AS ratio
      FROM s ORDER BY class, item"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, v) => k -> sql(v) }

  def oracle: Map[String, String] = bothEngines
}
