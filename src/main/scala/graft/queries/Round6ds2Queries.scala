package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 TPC-DS widening, batch 2: county-growth ratio cross-CTEs
  * (q31), store items below the store average (q65), per-channel
  * sales-vs-returns net report (q77/q80/q93), am/pm traffic ratio
  * (q90), cross-channel distinct-buyer FULL OUTER audit (q97), and
  * days-to-deliver bucket matrix (q99 — engine-specific date-diff
  * spellings, hence a split query/oracle pair).
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{31,65,77,80,
  * 90,93,97,99}.sql.
  */
object Round6ds2Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q31: per-nation quarter-over-quarter growth in two channels;
    // nations where the lineitem-channel growth beats the orders one
    "ds_quarter_growth_ratio" -> """
      WITH ss AS (
        SELECT n_name, quarter(o_orderdate) AS qtr,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total
        FROM orders JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey
        WHERE year(o_orderdate) = 1995
        GROUP BY n_name, quarter(o_orderdate)),
      ws AS (
        SELECT n_name, quarter(l_shipdate) AS qtr,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey
        WHERE year(l_shipdate) = 1995
        GROUP BY n_name, quarter(l_shipdate))
      SELECT ss1.n_name,
             ss2.total / ss1.total AS store_growth,
             ws2.total / ws1.total AS web_growth
      FROM ss ss1 JOIN ss ss2 ON ss1.n_name = ss2.n_name
           JOIN ws ws1 ON ss1.n_name = ws1.n_name
           JOIN ws ws2 ON ss1.n_name = ws2.n_name
      WHERE ss1.qtr = 1 AND ss2.qtr = 2 AND ws1.qtr = 1 AND ws2.qtr = 2
        AND ss1.total > 0 AND ws1.total > 0
        AND ws2.total / ws1.total > ss2.total / ss1.total
      ORDER BY ss1.n_name""",

    // q65: supplier-part revenue pairs at or below half the supplier's
    // average part revenue (the "slow movers" report)
    "ds_supplier_slow_items" -> """
      WITH sb AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS revenue_dec
        FROM lineitem
        WHERE year(l_shipdate) = 1995
        GROUP BY l_suppkey, l_partkey),
      sc AS (
        SELECT l_suppkey,
               CAST(SUM(revenue_dec) AS DOUBLE) / count(*) AS ave
        FROM sb GROUP BY l_suppkey)
      SELECT s_name, p_partkey, p_name, CAST(sb.revenue_dec AS DOUBLE) AS revenue, sc.ave
      FROM sb JOIN sc ON sb.l_suppkey = sc.l_suppkey
           JOIN supplier ON s_suppkey = sb.l_suppkey
           JOIN part ON p_partkey = sb.l_partkey
      WHERE CAST(sb.revenue_dec AS DOUBLE) <= 0.5 * sc.ave
      ORDER BY s_name, p_partkey
      LIMIT 100""",

    // q77/q80/q93: per-brand gross sales, returned amount (the R-flag
    // leg), and net — channels LEFT JOINed so brands without returns
    // survive with a zero
    "ds_sales_returns_net" -> """
      WITH sales AS (
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS gross,
               count(*) AS n_sold
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) = 1996
        GROUP BY p_brand),
      returns_leg AS (
        SELECT p_brand,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS returned,
               count(*) AS n_ret
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) = 1996 AND l_returnflag = 'R'
        GROUP BY p_brand)
      SELECT s.p_brand, s.gross,
             coalesce(r.returned, 0.0) AS returned,
             s.gross - coalesce(r.returned, 0.0) AS net,
             s.n_sold, coalesce(r.n_ret, 0) AS n_ret
      FROM sales s LEFT JOIN returns_leg r ON s.p_brand = r.p_brand
      ORDER BY s.p_brand""",

    // q90: morning vs evening event-traffic ratio as a single row
    "ds_am_pm_ratio" -> """
      SELECT CAST(am.amc AS DOUBLE) / pm.pmc AS am_pm_ratio, am.amc, pm.pmc
      FROM (SELECT count(*) AS amc FROM events
            WHERE hour(ts) BETWEEN 8 AND 9 AND event_type IN ('click', 'view')) am
           CROSS JOIN
           (SELECT count(*) AS pmc FROM events
            WHERE hour(ts) BETWEEN 19 AND 20 AND event_type IN ('click', 'view')) pm""",

    // q97: distinct (customer, part) buyer sets of two channels FULL
    // OUTER joined into store-only / web-only / both counts
    "ds_cross_channel_buyers" -> """
      WITH ssci AS (
        SELECT o_custkey AS customer_sk, l_partkey AS item_sk
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'A'
        GROUP BY o_custkey, l_partkey),
      csci AS (
        SELECT o_custkey AS customer_sk, l_partkey AS item_sk
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'N'
        GROUP BY o_custkey, l_partkey)
      SELECT CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                       AND csci.customer_sk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
             CAST(sum(CASE WHEN ssci.customer_sk IS NULL
                       AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
             CAST(sum(CASE WHEN ssci.customer_sk IS NOT NULL
                       AND csci.customer_sk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
      FROM ssci FULL OUTER JOIN csci
        ON ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) } ++ Map(
      // q99: ship-latency buckets (order date -> ship date) per
      // supplier nation x line status — date-diff spelling differs per
      // engine, so the oracle is a separate DuckDB text with identical
      // output columns
      "ds_delivery_buckets" -> sql("""
        SELECT n_name, l_linestatus,
               CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) <= 30
                        THEN 1 ELSE 0 END) AS BIGINT) AS d0_30,
               CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate)
                             BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
               CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate)
                             BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
               CAST(sum(CASE WHEN datediff(l_shipdate, o_orderdate) > 90
                        THEN 1 ELSE 0 END) AS BIGINT) AS d_over_90
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON n_nationkey = s_nationkey
        GROUP BY n_name, l_linestatus
        ORDER BY n_name, l_linestatus""")
    )

  def oracle: Map[String, String] = bothEngines ++ Map(
    "ds_delivery_buckets" -> """
      SELECT n_name, l_linestatus,
             CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30
                      THEN 1 ELSE 0 END) AS BIGINT) AS d0_30,
             CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                           BETWEEN 31 AND 60 THEN 1 ELSE 0 END) AS BIGINT) AS d31_60,
             CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate)
                           BETWEEN 61 AND 90 THEN 1 ELSE 0 END) AS BIGINT) AS d61_90,
             CAST(sum(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90
                      THEN 1 ELSE 0 END) AS BIGINT) AS d_over_90
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      GROUP BY n_name, l_linestatus
      ORDER BY n_name, l_linestatus"""
  )
}
