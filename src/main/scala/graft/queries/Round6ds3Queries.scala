package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 TPC-DS widening, batch 3: sixteen more shapes toward the
  * full 99-query battery — the brand/year report (q3), the
  * channel-rollup net report (q5), correlated-avg item pricing (q6),
  * demographic-band multi-avg reports (q7/q26/q27), the zip-list
  * INTERSECT selector (q8), revenue-ratio windows (q12/q20), the
  * distinct-order EXISTS/NOT-EXISTS count (q16), 4-level rollup
  * averages (q18), cross-region brand revenue (q19), inventory
  * before/after and rollup-average (q21/q22, inventory re-expressed
  * as shipped quantity per supplier-warehouse), the zip OR-band
  * selector (q15), and the store→returns→catalog customer/item
  * three-leg join (q25).
  *
  * Re-expression conventions (same as batches 1-2): channels =
  * l_returnflag legs or orders-vs-lineitem, item = part,
  * store/warehouse = supplier, address = nation/region, demographics
  * = c_mktsegment / c_acctbal bands, date_dim = year()/month()/
  * quarter() on shipdate/orderdate. One portable ANSI text per
  * pattern runs on BOTH engines. Averages are spelled
  * SUM(DECIMAL)/count so both engines compute them exactly; money
  * stays DECIMAL until a final DOUBLE cast; every ORDER BY under a
  * LIMIT carries a full tiebreak and explicit NULLS FIRST on
  * rollup-nullable keys (engine defaults differ).
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{3,5,6,7,8,
  * 12,15,16,18,19,20,21,22,25,26,27}.sql.
  */
object Round6ds3Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q3: year x brand revenue for one manufacturer digit in one month
    "ds_brand_year_report" -> """
      SELECT year(l_shipdate) AS d_year, p_brand,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_agg
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE substring(p_brand, 7, 1) = '1' AND month(l_shipdate) = 12
      GROUP BY year(l_shipdate), p_brand
      ORDER BY d_year, sum_agg DESC, p_brand
      LIMIT 100""",

    // q5: per-channel sales/returns/profit CTEs (each keyed by its own
    // id) unioned under ROLLUP(channel, id)
    "ds_channel_rollup_net" -> """
      WITH ssr AS (
        SELECT s_name AS id,
               SUM(CASE WHEN l_returnflag <> 'R'
                   THEN CAST(l_extendedprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS sales,
               SUM(CASE WHEN l_returnflag = 'R'
                   THEN CAST(l_extendedprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS returns,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))
                   * CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS profit
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        WHERE year(l_shipdate) = 1995 AND quarter(l_shipdate) = 2
        GROUP BY s_name),
      csr AS (
        SELECT o_orderpriority AS id,
               SUM(CASE WHEN o_orderstatus <> 'F'
                   THEN CAST(o_totalprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS sales,
               SUM(CASE WHEN o_orderstatus = 'F'
                   THEN CAST(o_totalprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS returns,
               SUM(CAST(o_totalprice AS DECIMAL(16,2)) * CAST(0.10 AS DECIMAL(4,2))) AS profit
        FROM orders
        WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2
        GROUP BY o_orderpriority),
      wsr AS (
        SELECT n_name AS id,
               SUM(CASE WHEN c_acctbal >= 0
                   THEN CAST(o_totalprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS sales,
               SUM(CASE WHEN c_acctbal < 0
                   THEN CAST(o_totalprice AS DECIMAL(16,2)) ELSE CAST(0 AS DECIMAL(16,2)) END) AS returns,
               SUM(CAST(o_totalprice AS DECIMAL(16,2)) * CAST(0.20 AS DECIMAL(4,2))) AS profit
        FROM orders JOIN customer ON c_custkey = o_custkey
             JOIN nation ON n_nationkey = c_nationkey
        WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 2
        GROUP BY n_name)
      SELECT channel, id,
             CAST(SUM(sales) AS DOUBLE) AS sales,
             CAST(SUM(returns) AS DOUBLE) AS returns,
             CAST(SUM(profit) AS DOUBLE) AS profit
      FROM (SELECT 'store channel' AS channel, concat('store', id) AS id,
                   sales, returns, profit FROM ssr
            UNION ALL
            SELECT 'catalog channel', concat('catalog_page', id),
                   sales, returns, profit FROM csr
            UNION ALL
            SELECT 'web channel', concat('web_site', id),
                   sales, returns, profit FROM wsr) x
      GROUP BY ROLLUP(channel, id)
      ORDER BY channel NULLS FIRST, id NULLS FIRST
      LIMIT 100""",

    // q6: customer nations buying items priced above 1.2x the average
    // of the item's type (correlated scalar average), HAVING >= 10
    "ds_high_priced_item_nations" -> """
      SELECT n_name AS state, count(*) AS cnt
      FROM customer JOIN nation ON n_nationkey = c_nationkey
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN part a ON a.p_partkey = l_partkey
      WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        AND a.p_retailprice > 1.02 *
            (SELECT CAST(SUM(CAST(b.p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
                    / count(*)
             FROM part b WHERE b.p_type = a.p_type)
      GROUP BY n_name
      HAVING count(*) >= 10
      ORDER BY cnt, state
      LIMIT 100""",

    // q7: four exact averages per item for one demographic band
    "ds_demo_band_avgs" -> """
      SELECT p_brand,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS agg1,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS agg2,
             CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS agg3,
             CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS agg4
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN part ON p_partkey = l_partkey
      WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 0
        AND year(o_orderdate) = 1995
      GROUP BY p_brand
      ORDER BY p_brand
      LIMIT 100""",

    // q8: supplier net sales where the supplier nation is in
    // (initial-letter list INTERSECT nations of >10 preferred customers)
    "ds_preferred_zip_sales" -> """
      WITH zips AS (
        SELECT n_name FROM nation
        WHERE substring(n_name, 8, 1) IN ('1', '3', '5', '7', '9')
        INTERSECT
        SELECT n_name
        FROM customer JOIN nation ON n_nationkey = c_nationkey
        WHERE c_acctbal > 5000
        GROUP BY n_name
        HAVING count(*) > 10)
      SELECT s_name,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS net_profit
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE year(l_shipdate) = 1995 AND quarter(l_shipdate) = 2
        AND n_name IN (SELECT n_name FROM zips)
      GROUP BY s_name
      ORDER BY s_name
      LIMIT 100""",

    // q12: per-item revenue with its share of the type's total via a
    // window over the aggregate (ratio on exact DECIMAL sums)
    "ds_revenue_ratio_window" -> """
      SELECT p_name, p_type, p_brand,
             CAST(ext_sum AS DOUBLE) AS itemrevenue,
             CAST(ext_sum AS DOUBLE) * 100 /
               CAST(sum(ext_sum) OVER (PARTITION BY p_type) AS DOUBLE) AS revenueratio
      FROM (SELECT p_name, p_type, p_brand,
                   SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS ext_sum
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_returnflag = 'N' AND year(l_shipdate) = 1995
              AND month(l_shipdate) IN (3, 4)
            GROUP BY p_name, p_type, p_brand) t
      ORDER BY p_type, itemrevenue DESC, p_name, p_brand
      LIMIT 100""",

    // q15: customer-nation sales under an OR of zone bands (initial
    // digraph list, region membership, or a big-ticket floor)
    "ds_zone_or_bands" -> """
      SELECT n_name AS zip,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_sales
      FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE (substring(n_name, 8, 1) IN ('2', '4', '6')
             OR r_name IN ('AFRICA', 'ASIA')
             OR o_totalprice > 250000)
        AND year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1
      GROUP BY n_name
      ORDER BY zip
      LIMIT 100""",

    // q16: distinct-order count + money total for orders with a second
    // line from a different supplier and no returned line
    "ds_order_count_exists" -> """
      SELECT count(DISTINCT o_orderkey) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total_price
      FROM orders o1 JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE year(o_orderdate) = 1995 AND month(o_orderdate) IN (1, 2)
        AND n_name IN ('GERMANY', 'FRANCE', 'CANADA', 'JAPAN', 'CHINA')
        AND EXISTS (SELECT 1 FROM lineitem l1
                    WHERE l1.l_orderkey = o1.o_orderkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l2
                        WHERE l2.l_orderkey = o1.o_orderkey
                          AND l2.l_returnflag = 'R')""",

    // q18: four exact averages under ROLLUP(item, country, state,
    // segment)
    "ds_rollup4_avgs" -> """
      SELECT p_brand, r_name, n_name, c_mktsegment,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS agg1,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS agg2,
             CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS agg3,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS agg4
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN region ON r_regionkey = n_regionkey
           JOIN part ON p_partkey = l_partkey
      WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 1
        AND p_size IN (10, 20, 30, 40)
      GROUP BY ROLLUP(p_brand, r_name, n_name, c_mktsegment)
      ORDER BY p_brand NULLS FIRST, r_name NULLS FIRST, n_name NULLS FIRST,
               c_mktsegment NULLS FIRST
      LIMIT 100""",

    // q19: brand revenue where the buyer's nation differs from the
    // supplier's (the different-zip join), one month
    "ds_cross_nation_brand" -> """
      SELECT substring(p_brand, 7, 1) AS brand_id, p_brand,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS ext_price
      FROM lineitem JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
      WHERE year(o_orderdate) = 1995 AND month(o_orderdate) = 11
        AND c_nationkey <> s_nationkey
      GROUP BY substring(p_brand, 7, 1), p_brand
      ORDER BY ext_price DESC, brand_id, p_brand
      LIMIT 100""",

    // q20: the catalog-channel revenue-ratio window (q12 skeleton,
    // different leg + selector)
    "ds_catalog_ratio_window" -> """
      SELECT p_name, p_type, p_brand,
             CAST(ext_sum AS DOUBLE) AS itemrevenue,
             CAST(ext_sum AS DOUBLE) * 100 /
               CAST(sum(ext_sum) OVER (PARTITION BY p_type) AS DOUBLE) AS revenueratio
      FROM (SELECT p_name, p_type, p_brand,
                   SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS ext_sum
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_returnflag = 'A' AND p_size IN (1, 2, 3, 4, 5)
              AND year(l_shipdate) = 1996
            GROUP BY p_name, p_type, p_brand) t
      ORDER BY p_type, itemrevenue DESC, p_name, p_brand
      LIMIT 100""",

    // q21: shipped quantity per warehouse(=supplier) x item before and
    // after a pivot date, kept when the ratio is within [2/3, 3/2]
    "ds_inventory_before_after" -> """
      SELECT s_name, p_name, inv_before, inv_after
      FROM (SELECT s_name, p_name,
                   CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
                       THEN CAST(l_quantity AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS inv_before,
                   CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
                       THEN CAST(l_quantity AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS inv_after
            FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                 JOIN part ON p_partkey = l_partkey
            WHERE year(l_shipdate) = 1995 AND month(l_shipdate) IN (5, 6)
              AND p_size BETWEEN 1 AND 20
            GROUP BY s_name, p_name) x
      WHERE CASE WHEN inv_before > 0 THEN inv_after / inv_before ELSE NULL END
            BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
      ORDER BY s_name, p_name
      LIMIT 100""",

    // q22: average on-hand(=shipped) quantity under the full product
    // hierarchy ROLLUP over a 12-month window
    "ds_inventory_rollup_avg" -> """
      SELECT p_name, p_brand, p_type,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS qoh
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE year(l_shipdate) = 1995
      GROUP BY ROLLUP(p_name, p_brand, p_type)
      ORDER BY qoh, p_name NULLS FIRST, p_brand NULLS FIRST, p_type NULLS FIRST
      LIMIT 100""",

    // q25: (buyer-nation, brand) cells sold in April (leg 1), returned
    // over the following months (leg 2), and re-bought on the catalog
    // channel (leg 3) — three pre-aggregated legs joined on the cell
    "ds_sale_return_rebuy" -> """
      WITH ss AS (
        SELECT c_nationkey AS nk, p_brand AS b,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS store_profit
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'A' AND year(l_shipdate) = 1995
          AND month(l_shipdate) = 4
        GROUP BY c_nationkey, p_brand),
      sr AS (
        SELECT c_nationkey AS nk, p_brand AS b,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                   * CAST(l_tax AS DECIMAL(4,2))) AS net_loss
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1995
          AND month(l_shipdate) BETWEEN 4 AND 10
        GROUP BY c_nationkey, p_brand),
      cs AS (
        SELECT c_nationkey AS nk, p_brand AS b,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS catalog_profit
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN part ON p_partkey = l_partkey
        WHERE l_returnflag = 'N' AND year(l_shipdate) = 1995
          AND month(l_shipdate) BETWEEN 4 AND 10
        GROUP BY c_nationkey, p_brand)
      SELECT n_name, ss.b AS p_brand,
             CAST(ss.store_profit AS DOUBLE) AS store_profit,
             CAST(sr.net_loss AS DOUBLE) AS net_loss,
             CAST(cs.catalog_profit AS DOUBLE) AS catalog_profit
      FROM ss JOIN sr ON ss.nk = sr.nk AND ss.b = sr.b
           JOIN cs ON ss.nk = cs.nk AND ss.b = cs.b
           JOIN nation ON n_nationkey = ss.nk
      ORDER BY n_name, p_brand
      LIMIT 100""",

    // q26: the q7 skeleton on the orders channel with a different band
    "ds_catalog_demo_avgs" -> """
      SELECT o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS agg1,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS agg2,
             count(*) AS cnt
      FROM orders JOIN customer ON c_custkey = o_custkey
      WHERE c_mktsegment IN ('MACHINERY', 'HOUSEHOLD') AND c_acctbal >= 1000
        AND year(o_orderdate) = 1996
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
      LIMIT 100""",

    // q27: the q7 skeleton under ROLLUP(item, state)
    "ds_state_rollup_avgs" -> """
      SELECT p_brand, n_name,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS agg1,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS agg2,
             CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS agg3
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN part ON p_partkey = l_partkey
      WHERE c_mktsegment = 'AUTOMOBILE' AND year(o_orderdate) = 1995
      GROUP BY ROLLUP(p_brand, n_name)
      ORDER BY p_brand NULLS FIRST, n_name NULLS FIRST
      LIMIT 100"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
