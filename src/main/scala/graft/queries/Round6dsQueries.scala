package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 TPC-DS widening, batch 1 (VERDICT r5 item 1): the ten
  * named shapes — year-over-year multi-channel CTE chains (q4/q11),
  * sequential moving-average windows via self-join and via lag/lead
  * (q47/q57), the wide resale multi-join (q64), multi-scan count
  * buckets cross-joined into one row (q88), and the three-channel
  * UNION reports (q33/q56/q60) plus the null-column channel audit
  * (q76). Re-expressed over the TPC-H-ish fixtures: channels =
  * l_returnflag legs (or orders vs lineitem), item dims = part
  * columns, time dim = shipdate parts, store = supplier/nation.
  *
  * One portable ANSI text per pattern runs on BOTH engines, so the
  * oracle is the same string. Money stays DECIMAL until the final
  * DOUBLE cast; every ORDER BY carries a full tiebreak so LIMIT is
  * deterministic cross-engine.
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{4,11,33,47,
  * 56,57,60,64,76,88}.sql.
  */
object Round6dsQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q4: four instances of a two-channel year_total CTE, customers
    // whose channel-c growth beats channel-s growth year over year
    "ds_yoy_two_channel_pref" -> """
      WITH year_total AS (
        SELECT c_custkey AS customer_id, c_name AS customer_name,
               year(o_orderdate) AS dyear,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS year_total,
               's' AS sale_type
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name, year(o_orderdate)
        UNION ALL
        SELECT c_custkey, c_name, year(l_shipdate),
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
               'c'
        FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY c_custkey, c_name, year(l_shipdate))
      SELECT ts2.customer_id, ts2.customer_name
      FROM year_total ts1 JOIN year_total ts2 ON ts1.customer_id = ts2.customer_id
           JOIN year_total tc1 ON ts1.customer_id = tc1.customer_id
           JOIN year_total tc2 ON ts1.customer_id = tc2.customer_id
      WHERE ts1.sale_type = 's' AND ts2.sale_type = 's'
        AND tc1.sale_type = 'c' AND tc2.sale_type = 'c'
        AND ts1.dyear = 1996 AND ts2.dyear = 1997
        AND tc1.dyear = 1996 AND tc2.dyear = 1997
        AND ts1.year_total > 0 AND tc1.year_total > 0
        AND CASE WHEN tc1.year_total > 0 THEN tc2.year_total / tc1.year_total
                 ELSE 0.0 END
          > CASE WHEN ts1.year_total > 0 THEN ts2.year_total / ts1.year_total
                 ELSE 0.0 END
      ORDER BY ts2.customer_id
      LIMIT 100""",

    // q11: same family, channels = returned vs kept revenue legs
    "ds_yoy_returnflag_growth" -> """
      WITH year_total AS (
        SELECT c_custkey AS customer_id, year(l_shipdate) AS dyear,
               l_returnflag AS sale_type,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS year_total
        FROM customer JOIN orders ON c_custkey = o_custkey
             JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_returnflag IN ('A', 'R')
        GROUP BY c_custkey, year(l_shipdate), l_returnflag)
      SELECT ta2.customer_id,
             ta2.year_total / ta1.year_total AS kept_growth,
             tr2.year_total / tr1.year_total AS ret_growth
      FROM year_total ta1 JOIN year_total ta2 ON ta1.customer_id = ta2.customer_id
           JOIN year_total tr1 ON ta1.customer_id = tr1.customer_id
           JOIN year_total tr2 ON ta1.customer_id = tr2.customer_id
      WHERE ta1.sale_type = 'A' AND ta2.sale_type = 'A'
        AND tr1.sale_type = 'R' AND tr2.sale_type = 'R'
        AND ta1.dyear = 1995 AND ta2.dyear = 1996
        AND tr1.dyear = 1995 AND tr2.dyear = 1996
        AND ta1.year_total > 0 AND tr1.year_total > 0
        AND tr2.year_total / tr1.year_total > ta2.year_total / ta1.year_total
      ORDER BY ta2.customer_id
      LIMIT 100""",

    // q47: monthly brand x nation sales vs yearly average, previous and
    // next month recovered by rank self-join (the reference's spelling)
    "ds_seq_moving_avg" -> """
      WITH v1 AS (
        SELECT p_brand, n_name, year(l_shipdate) AS yr, month(l_shipdate) AS mon,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_sales,
               CAST(sum(SUM(CAST(l_extendedprice AS DECIMAL(16,2)))) OVER
                      (PARTITION BY p_brand, n_name, year(l_shipdate)) AS DOUBLE)
                 / count(*) OVER (PARTITION BY p_brand, n_name, year(l_shipdate))
                 AS avg_monthly_sales,
               rank() OVER (PARTITION BY p_brand, n_name
                            ORDER BY year(l_shipdate), month(l_shipdate)) AS rn
        FROM lineitem JOIN part ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON n_nationkey = s_nationkey
        WHERE year(l_shipdate) BETWEEN 1994 AND 1996
        GROUP BY p_brand, n_name, year(l_shipdate), month(l_shipdate)),
      v2 AS (
        SELECT v1.p_brand, v1.n_name, v1.yr, v1.mon,
               v1.avg_monthly_sales, v1.sum_sales,
               v1_lag.sum_sales AS psum, v1_lead.sum_sales AS nsum
        FROM v1 JOIN v1 v1_lag ON v1.p_brand = v1_lag.p_brand
                AND v1.n_name = v1_lag.n_name AND v1.rn = v1_lag.rn + 1
             JOIN v1 v1_lead ON v1.p_brand = v1_lead.p_brand
                AND v1.n_name = v1_lead.n_name AND v1.rn = v1_lead.rn - 1)
      SELECT p_brand, n_name, yr, mon, sum_sales, avg_monthly_sales, psum, nsum
      FROM v2
      WHERE yr = 1995 AND avg_monthly_sales > 0
        AND CASE WHEN avg_monthly_sales > 0
                 THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales
                 ELSE NULL END > 0.1
      ORDER BY sum_sales - avg_monthly_sales, p_brand, n_name, mon
      LIMIT 100""",

    // q57: the same sequential pattern spelled with lag/lead windows
    // over order-priority monthly totals
    "ds_priority_lag_lead" -> """
      WITH v1 AS (
        SELECT o_orderpriority AS pri, year(o_orderdate) AS yr,
               month(o_orderdate) AS mon,
               SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS sum_dec
        FROM orders
        WHERE year(o_orderdate) BETWEEN 1994 AND 1996
        GROUP BY o_orderpriority, year(o_orderdate), month(o_orderdate)),
      v2 AS (
        SELECT pri, yr, mon, CAST(sum_dec AS DOUBLE) AS sum_sales,
               CAST(sum(sum_dec) OVER (PARTITION BY pri, yr) AS DOUBLE)
                 / count(*) OVER (PARTITION BY pri, yr) AS avg_monthly_sales,
               CAST(lag(sum_dec) OVER (PARTITION BY pri ORDER BY yr, mon) AS DOUBLE) AS psum,
               CAST(lead(sum_dec) OVER (PARTITION BY pri ORDER BY yr, mon) AS DOUBLE) AS nsum
        FROM v1)
      SELECT pri, yr, mon, sum_sales, avg_monthly_sales, psum, nsum
      FROM v2
      WHERE yr = 1995 AND psum IS NOT NULL AND nsum IS NOT NULL
        AND abs(sum_sales - avg_monthly_sales) / avg_monthly_sales > 0.02
      ORDER BY sum_sales - avg_monthly_sales, pri, mon
      LIMIT 100""",

    // q64: returned-item set (sale > 2x refund proxy) -> wide 7-table
    // cross_sales -> same item+nations joined across two years
    "ds_wide_resale" -> """
      WITH returned AS (
        SELECT l_partkey AS rk FROM lineitem
        WHERE l_returnflag = 'R'
        GROUP BY l_partkey
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) >
               15 * CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                             * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)),
      cross_sales AS (
        SELECT p_name AS product_name, p_partkey AS item_sk,
               year(o_orderdate) AS syear,
               cn.n_name AS cust_nation, sn.n_name AS supp_nation,
               count(*) AS cnt,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS s2
        FROM lineitem
             JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN part ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
        WHERE l_partkey IN (SELECT rk FROM returned)
        GROUP BY p_name, p_partkey, year(o_orderdate), cn.n_name, sn.n_name)
      SELECT cs1.product_name, cs1.item_sk, cs1.cust_nation, cs1.supp_nation,
             cs1.cnt AS cnt1, cs2.cnt AS cnt2,
             cs1.s1 AS sale1, cs2.s1 AS sale2, cs1.s2 AS qty1, cs2.s2 AS qty2
      FROM cross_sales cs1 JOIN cross_sales cs2
        ON cs1.item_sk = cs2.item_sk AND cs1.supp_nation = cs2.supp_nation
      WHERE cs1.syear = 1996 AND cs2.syear = 1997 AND cs2.cnt <= cs1.cnt
      ORDER BY cs1.product_name, cs1.item_sk, cs1.cust_nation, cs1.supp_nation,
               cs1.cnt, cs2.cnt, cs1.s1, cs2.s1, cs1.s2, cs2.s2
      LIMIT 100""",

    // q88: eight independent hour-band counts with a disjunctive
    // demographic-style band, cross-joined into a single row
    "ds_hour_buckets" -> """
      SELECT s1.h8, s2.h9, s3.h10, s4.h11, s5.h12, s6.h13, s7.h14, s8.h15
      FROM
       (SELECT count(*) AS h8 FROM events
        WHERE hour(ts) = 8
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s1
       CROSS JOIN
       (SELECT count(*) AS h9 FROM events
        WHERE hour(ts) = 9
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s2
       CROSS JOIN
       (SELECT count(*) AS h10 FROM events
        WHERE hour(ts) = 10
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s3
       CROSS JOIN
       (SELECT count(*) AS h11 FROM events
        WHERE hour(ts) = 11
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s4
       CROSS JOIN
       (SELECT count(*) AS h12 FROM events
        WHERE hour(ts) = 12
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s5
       CROSS JOIN
       (SELECT count(*) AS h13 FROM events
        WHERE hour(ts) = 13
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s6
       CROSS JOIN
       (SELECT count(*) AS h14 FROM events
        WHERE hour(ts) = 14
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s7
       CROSS JOIN
       (SELECT count(*) AS h15 FROM events
        WHERE hour(ts) = 15
          AND ((event_type = 'click' AND value <= 50)
            OR (event_type = 'view' AND value <= 75)
            OR (event_type = 'signup' AND value <= 100))) s8""",

    // q33: three returnflag channels restricted to an IN-subquery
    // manufacturer set (mfgr digit of Brand#MN), union-aggregated per
    // manufacturer
    "ds_three_channel_manufact" -> """
      WITH mf AS (SELECT substring(p_brand, 7, 1) AS p_mfgr FROM part
                  WHERE p_type = 'PROMO'
                  GROUP BY substring(p_brand, 7, 1)),
      ss AS (
        SELECT substring(p_brand, 7, 1) AS p_mfgr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A' AND year(l_shipdate) = 1995
          AND substring(p_brand, 7, 1) IN (SELECT p_mfgr FROM mf)
        GROUP BY substring(p_brand, 7, 1)),
      cs AS (
        SELECT substring(p_brand, 7, 1) AS p_mfgr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) = 1995
          AND substring(p_brand, 7, 1) IN (SELECT p_mfgr FROM mf)
        GROUP BY substring(p_brand, 7, 1)),
      ws AS (
        SELECT substring(p_brand, 7, 1) AS p_mfgr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1995
          AND substring(p_brand, 7, 1) IN (SELECT p_mfgr FROM mf)
        GROUP BY substring(p_brand, 7, 1))
      SELECT p_mfgr, CAST(SUM(CAST(total_sales AS DECIMAL(18,4))) AS DOUBLE)
               AS total_sales
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
            UNION ALL SELECT * FROM ws) tmp
      GROUP BY p_mfgr
      ORDER BY total_sales, p_mfgr""",

    // q56: same three-channel skeleton keyed by part with a
    // container-set selector, ordered by total with a LIMIT
    "ds_three_channel_items" -> """
      WITH ids AS (SELECT p_partkey FROM part
                   WHERE p_size IN (1, 2, 3)),
      ss AS (
        SELECT p_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A' AND year(l_shipdate) = 1996
          AND p_partkey IN (SELECT p_partkey FROM ids)
        GROUP BY p_partkey),
      cs AS (
        SELECT p_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
          AND p_partkey IN (SELECT p_partkey FROM ids)
        GROUP BY p_partkey),
      ws AS (
        SELECT p_partkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
          AND p_partkey IN (SELECT p_partkey FROM ids)
        GROUP BY p_partkey)
      SELECT p_partkey, CAST(SUM(CAST(total_sales AS DECIMAL(18,4))) AS DOUBLE)
               AS total_sales
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
            UNION ALL SELECT * FROM ws) tmp
      GROUP BY p_partkey
      ORDER BY total_sales, p_partkey
      LIMIT 100""",

    // q60: the brand-keyed variant with a type-prefix selector
    "ds_three_channel_brand" -> """
      WITH ids AS (SELECT p_brand FROM part WHERE p_type LIKE 'ECONOMY%'
                   GROUP BY p_brand),
      ss AS (
        SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A' AND year(l_shipdate) = 1996
          AND p_brand IN (SELECT p_brand FROM ids)
        GROUP BY p_brand),
      cs AS (
        SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) = 1996
          AND p_brand IN (SELECT p_brand FROM ids)
        GROUP BY p_brand),
      ws AS (
        SELECT p_brand, CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE)
                 AS total_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
          AND p_brand IN (SELECT p_brand FROM ids)
        GROUP BY p_brand)
      SELECT p_brand, CAST(SUM(CAST(total_sales AS DECIMAL(18,4))) AS DOUBLE)
               AS total_sales
      FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs
            UNION ALL SELECT * FROM ws) tmp
      GROUP BY p_brand
      ORDER BY total_sales, p_brand
      LIMIT 100""",

    // q76: three channel scans each auditing a different "absent"
    // column marker, unioned and rolled up by channel/col/year/quarter
    "ds_null_col_channels" -> """
      SELECT channel, col_name, yr, qtr, p_brand,
             count(*) AS sales_cnt,
             CAST(SUM(ext) AS DOUBLE) AS sales_amt
      FROM (
        SELECT 'store' AS channel, 'l_discount' AS col_name,
               year(l_shipdate) AS yr, quarter(l_shipdate) AS qtr, p_brand,
               CAST(l_extendedprice AS DECIMAL(16,2)) AS ext
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_discount = 0
        UNION ALL
        SELECT 'web', 'l_tax', year(l_shipdate), quarter(l_shipdate), p_brand,
               CAST(l_extendedprice AS DECIMAL(16,2))
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_tax = 0
        UNION ALL
        SELECT 'catalog', 'l_returnflag', year(l_shipdate), quarter(l_shipdate),
               p_brand, CAST(l_extendedprice AS DECIMAL(16,2))
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) <= 1996) foo
      GROUP BY channel, col_name, yr, qtr, p_brand
      ORDER BY channel, col_name, yr, qtr, p_brand
      LIMIT 100"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
