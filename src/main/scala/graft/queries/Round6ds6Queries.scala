package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 TPC-DS widening, batch 6 — the closing sixteen shapes of
  * the 99-query battery: the grouping()-hierarchy ranks with and
  * without the ranked-selector subquery (q70/q86), the three-channel
  * time-of-day brand report over the events fact (q71), the
  * inventory-undercut promo counts (q72), union-DEDUP year-over-year
  * channel decline (q75), the unreturned store-vs-other-channel
  * ratio (q78), the weekday ticket profit report (q79), the
  * week-set three-channel returns balance (q83), the income-band
  * customer list with concat display names (q84), per-reason return
  * averages under OR'd double bands (q85), the windowed-deviation
  * report at (type, brand, store) grain (q89), the call-center loss
  * report (q91), the web excess-discount twin (q92), and the
  * cross-warehouse EXISTS / CTE-reuse order stats (q94/q95) plus the
  * time-of-day count (q96, events as the time dimension).
  *
  * With batches 1-5 this closes the full query1..99 shape coverage
  * (q30 covers the q81 skeleton, q34 covers q73, q37 covers q82).
  * Re-expression conventions as earlier batches; events supplies
  * hour()/minute() where TPC-DS uses time_dim, and latency axes are
  * month-granular where day-level datediff is not portable.
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{70,71,72,75,
  * 78,79,83,84,85,86,89,91,92,94,95,96}.sql.
  */
object Round6ds6Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q70: profit under ROLLUP(nation, supplier) restricted to the top-5
    // nations by a ranked subquery, with grouping()-derived hierarchy level
    // and rank-within-parent
    "ds_lochierarchy_top5" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_sum,
             n_name, s_name,
             grouping(n_name) + grouping(s_name) AS lochierarchy,
             rank() OVER (PARTITION BY grouping(n_name) + grouping(s_name),
                          CASE WHEN grouping(s_name) = 0 THEN n_name END
                          ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                                       * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC,
                                   n_name, s_name) AS rank_within_parent
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE year(l_shipdate) = 1996
        AND n_name IN (SELECT st FROM (
                         SELECT n_name AS st,
                                rank() OVER (ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                                                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) DESC,
                                             n_name) AS ranking
                         FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                              JOIN nation ON n_nationkey = s_nationkey
                         WHERE year(l_shipdate) = 1996
                         GROUP BY n_name) tmp1
                       WHERE ranking <= 5)
      GROUP BY ROLLUP(n_name, s_name)
      ORDER BY lochierarchy DESC,
               CASE WHEN lochierarchy = 0 THEN n_name END NULLS FIRST,
               rank_within_parent, n_name NULLS FIRST, s_name NULLS FIRST
      LIMIT 100""",

    // q71: brand x hour x minute revenue over three unioned event channels
    // in the breakfast/dinner windows (events supplies the time dimension)
    "ds_brand_hour_minute" -> """
      SELECT c_mktsegment AS brand, t_hour, t_minute,
             CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS ext_price
      FROM (SELECT user_id, value, hour(ts) AS t_hour, minute(ts) AS t_minute
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, value, hour(ts), minute(ts)
            FROM events WHERE event_type = 'click'
            UNION ALL
            SELECT user_id, value, hour(ts), minute(ts)
            FROM events WHERE event_type = 'view') tmp
           JOIN customer ON c_custkey = user_id
      WHERE (t_hour BETWEEN 6 AND 9 OR t_hour BETWEEN 17 AND 20)
      GROUP BY c_mktsegment, t_hour, t_minute
      ORDER BY ext_price DESC, brand, t_hour, t_minute
      LIMIT 100""",

    // q72: promo/no-promo counts where the inventory leg (same item, same
    // ISO week, lower on-hand quantity) undercuts the order and the ship
    // month trails the order month
    "ds_promo_inventory_week" -> """
      SELECT p_name, s_name, weekofyear(o_orderdate) AS wk,
             CAST(SUM(CASE WHEN pr.ppk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
             CAST(SUM(CASE WHEN pr.ppk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS promo,
             count(*) AS total_cnt
      FROM lineitem cs
           JOIN orders ON o_orderkey = cs.l_orderkey
           JOIN lineitem inv ON inv.l_partkey = cs.l_partkey
                AND weekofyear(inv.l_shipdate) = weekofyear(o_orderdate)
                AND year(inv.l_shipdate) = year(o_orderdate)
                AND inv.l_quantity < cs.l_quantity
           JOIN part ON p_partkey = cs.l_partkey
           JOIN supplier ON s_suppkey = inv.l_suppkey
           LEFT JOIN (SELECT DISTINCT p_partkey AS ppk FROM part WHERE p_type = 'PROMO') pr
             ON pr.ppk = cs.l_partkey
      WHERE year(o_orderdate) = 1996
        AND (year(cs.l_shipdate) * 12 + month(cs.l_shipdate))
            > (year(o_orderdate) * 12 + month(o_orderdate))
        AND o_orderpriority = '1-URGENT'
      GROUP BY p_name, s_name, weekofyear(o_orderdate)
      ORDER BY total_cnt DESC, p_name, s_name, wk
      LIMIT 100""",

    // q75: union-DEDUP of per-row channel sale-minus-return tuples,
    // aggregated per year x brand, self-joined on consecutive years where
    // the current year shrank below 0.9x
    "ds_yoy_channel_decline" -> """
      WITH sales_detail AS (
        SELECT year(l.l_shipdate) AS d_year, p_brand,
               CAST(l.l_quantity AS BIGINT) - coalesce(r.rqty, 0) AS sales_cnt,
               CAST(l.l_extendedprice AS DECIMAL(16,2))
                 - coalesce(r.ramt, CAST(0 AS DECIMAL(16,2))) AS sales_amt
        FROM lineitem l
             LEFT JOIN (SELECT l_orderkey AS rok, l_partkey AS rpk,
                               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS rqty,
                               SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS ramt
                        FROM lineitem WHERE l_returnflag = 'R'
                        GROUP BY l_orderkey, l_partkey) r
               ON r.rok = l.l_orderkey AND r.rpk = l.l_partkey
             JOIN part ON p_partkey = l.l_partkey
        WHERE l.l_returnflag <> 'R' AND p_type = 'STANDARD'),
      all_sales AS (
        SELECT d_year, p_brand,
               CAST(SUM(sales_cnt) AS BIGINT) AS sales_cnt, SUM(sales_amt) AS sales_amt
        FROM (SELECT DISTINCT d_year, p_brand, sales_cnt, sales_amt FROM sales_detail) x
        GROUP BY d_year, p_brand)
      SELECT prev_yr.d_year AS prev_year, curr_yr.d_year AS curr_year,
             curr_yr.p_brand AS brand,
             prev_yr.sales_cnt AS prev_yr_cnt, curr_yr.sales_cnt AS curr_yr_cnt,
             curr_yr.sales_cnt - prev_yr.sales_cnt AS sales_cnt_diff,
             CAST(curr_yr.sales_amt - prev_yr.sales_amt AS DOUBLE) AS sales_amt_diff
      FROM all_sales curr_yr JOIN all_sales prev_yr
        ON curr_yr.p_brand = prev_yr.p_brand AND curr_yr.d_year = prev_yr.d_year + 1
      WHERE curr_yr.d_year = 1997
        AND CAST(curr_yr.sales_cnt AS DOUBLE) / CAST(prev_yr.sales_cnt AS DOUBLE) < 0.9
      ORDER BY sales_cnt_diff, sales_amt_diff, brand
      LIMIT 100""",

    // q78: unreturned per (year, item, customer) volumes per channel; store
    // leg kept when a secondary channel also sold, with the store/other
    // ratio
    "ds_store_vs_other_ratio" -> """
      WITH ws AS (
        SELECT year(l.l_shipdate) AS y, l.l_partkey AS ik, o_custkey AS ck,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               SUM(CAST(l.l_extendedprice AS DECIMAL(16,2))) AS sp
        FROM lineitem l JOIN orders ON o_orderkey = l.l_orderkey
             LEFT JOIN (SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
                        FROM lineitem WHERE l_returnflag = 'R') r
               ON r.rok = l.l_orderkey AND r.rpk = l.l_partkey
        WHERE r.rok IS NULL AND l.l_returnflag = 'N' AND l.l_linestatus = 'O'
        GROUP BY year(l.l_shipdate), l.l_partkey, o_custkey),
      cs AS (
        SELECT year(l.l_shipdate) AS y, l.l_partkey AS ik, o_custkey AS ck,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               SUM(CAST(l.l_extendedprice AS DECIMAL(16,2))) AS sp
        FROM lineitem l JOIN orders ON o_orderkey = l.l_orderkey
             LEFT JOIN (SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
                        FROM lineitem WHERE l_returnflag = 'R') r
               ON r.rok = l.l_orderkey AND r.rpk = l.l_partkey
        WHERE r.rok IS NULL AND l.l_returnflag = 'N' AND l.l_linestatus = 'F'
        GROUP BY year(l.l_shipdate), l.l_partkey, o_custkey),
      ss AS (
        SELECT year(l.l_shipdate) AS y, l.l_partkey AS ik, o_custkey AS ck,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
               SUM(CAST(l.l_extendedprice AS DECIMAL(16,2))) AS sp
        FROM lineitem l JOIN orders ON o_orderkey = l.l_orderkey
             LEFT JOIN (SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
                        FROM lineitem WHERE l_returnflag = 'R') r
               ON r.rok = l.l_orderkey AND r.rpk = l.l_partkey
        WHERE r.rok IS NULL AND l.l_returnflag = 'A'
        GROUP BY year(l.l_shipdate), l.l_partkey, o_custkey)
      SELECT ss.ck AS customer_sk,
             CAST(ss.qty AS DOUBLE)
               / (coalesce(ws.qty, 0) + coalesce(cs.qty, 0)) AS ratio,
             ss.qty AS store_qty,
             CAST(ss.sp AS DOUBLE) AS store_sales_price,
             coalesce(ws.qty, 0) + coalesce(cs.qty, 0) AS other_chan_qty,
             CAST(coalesce(ws.sp, CAST(0 AS DECIMAL(16,2)))
                  + coalesce(cs.sp, CAST(0 AS DECIMAL(16,2))) AS DOUBLE) AS other_chan_sales_price
      FROM ss LEFT JOIN ws ON ws.y = ss.y AND ws.ik = ss.ik AND ws.ck = ss.ck
              LEFT JOIN cs ON cs.y = ss.y AND cs.ik = ss.ik AND cs.ck = ss.ck
      WHERE (coalesce(ws.qty, 0) > 0 OR coalesce(cs.qty, 0) > 0) AND ss.y = 1996
      ORDER BY ratio, customer_sk, store_qty, store_sales_price,
               other_chan_qty, other_chan_sales_price
      LIMIT 100""",

    // q79: per-ticket discount/profit on one pseudo-weekday across three
    // years, store city analog = supplier nation, joined to customer
    "ds_ticket_city_profit" -> """
      SELECT c_name, city, ok AS ticket_number, amt, profit
      FROM (SELECT o_orderkey AS ok, o_custkey AS ck, n_name AS city,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                            * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS amt,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                            * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS profit
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                 JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation ON n_nationkey = s_nationkey
            WHERE mod(day(o_orderdate), 7) = 1
              AND year(o_orderdate) IN (1996, 1997, 1998)
              AND s_acctbal BETWEEN 0 AND 5000
            GROUP BY o_orderkey, o_custkey, n_name) ms
           JOIN customer ON c_custkey = ck
      ORDER BY c_name, city, profit, ticket_number, amt
      LIMIT 100""",

    // q83: three return-channel item quantities over a week set selected
    // from a date list, joined with per-leg deviation from the three-way
    // average
    "ds_three_channel_returns_weeks" -> """
      WITH wks AS (
        SELECT DISTINCT year(l_shipdate) AS y, weekofyear(l_shipdate) AS w
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) IN ('1996-07-13', '1996-09-10', '1996-11-16')),
      sr AS (
        SELECT l_partkey AS item, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN wks ON year(l_shipdate) = wks.y AND weekofyear(l_shipdate) = wks.w
        WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        GROUP BY l_partkey),
      cr AS (
        SELECT l_partkey AS item, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN wks ON year(l_shipdate) = wks.y AND weekofyear(l_shipdate) = wks.w
        WHERE l_returnflag = 'R' AND l_linestatus = 'O'
        GROUP BY l_partkey),
      wr AS (
        SELECT l_partkey AS item, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem JOIN wks ON year(l_shipdate) = wks.y AND weekofyear(l_shipdate) = wks.w
        WHERE l_returnflag = 'A'
        GROUP BY l_partkey)
      SELECT sr.item AS item_id, sr.qty AS sr_item_qty,
             CAST(sr.qty AS DOUBLE) / (CAST(sr.qty + cr.qty + wr.qty AS DOUBLE) / 3) * 100 AS sr_dev,
             cr.qty AS cr_item_qty,
             CAST(cr.qty AS DOUBLE) / (CAST(sr.qty + cr.qty + wr.qty AS DOUBLE) / 3) * 100 AS cr_dev,
             wr.qty AS wr_item_qty,
             CAST(wr.qty AS DOUBLE) / (CAST(sr.qty + cr.qty + wr.qty AS DOUBLE) / 3) * 100 AS wr_dev,
             CAST(sr.qty + cr.qty + wr.qty AS DOUBLE) / 3 AS average
      FROM sr JOIN cr ON sr.item = cr.item JOIN wr ON sr.item = wr.item
      ORDER BY item_id, sr_item_qty
      LIMIT 100""",

    // q84: customer id plus concatenated display name for one city and
    // account-balance income band, restricted to customers with a return
    "ds_income_band_customers" -> """
      SELECT c_name AS customer_id,
             concat(concat(coalesce(n_name, ''), ','), coalesce(c_mktsegment, '')) AS customername
      FROM customer JOIN nation ON n_nationkey = c_nationkey
      WHERE n_name = 'NATION_5' AND c_acctbal BETWEEN 1000 AND 6000
        AND EXISTS (SELECT 1 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                    WHERE o_custkey = c_custkey AND l_returnflag = 'R')
      ORDER BY customer_id
      LIMIT 100""",

    // q85: per-reason return averages under OR'd double-band combinations
    // (demographic x price, geography x balance)
    "ds_reason_band_avgs" -> """
      SELECT o_orderpriority AS reason,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS avg_refund,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_fee
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996
        AND ((c_mktsegment = 'BUILDING' AND l_extendedprice BETWEEN 10000 AND 50000)
          OR (c_mktsegment = 'MACHINERY' AND l_extendedprice BETWEEN 20000 AND 60000)
          OR (c_mktsegment = 'AUTOMOBILE' AND l_extendedprice BETWEEN 30000 AND 70000))
        AND ((substring(n_name, 8, 1) IN ('1', '2', '3') AND c_acctbal BETWEEN -1000 AND 4000)
          OR (substring(n_name, 8, 1) IN ('4', '5', '6') AND c_acctbal BETWEEN 0 AND 6000)
          OR (substring(n_name, 8, 1) IN ('7', '8', '9') AND c_acctbal BETWEEN 2000 AND 10000))
      GROUP BY o_orderpriority
      ORDER BY avg_qty, reason
      LIMIT 100""",

    // q86: the web-channel ROLLUP(category, class) hierarchy rank (the q70
    // skeleton without the selector subquery)
    "ds_web_lochierarchy" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS total_sum,
             p_type, p_brand,
             grouping(p_type) + grouping(p_brand) AS lochierarchy,
             rank() OVER (PARTITION BY grouping(p_type) + grouping(p_brand),
                          CASE WHEN grouping(p_brand) = 0 THEN p_type END
                          ORDER BY SUM(CAST(l_extendedprice AS DECIMAL(16,2))) DESC,
                                   p_type, p_brand) AS rank_within_parent
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_linestatus = 'O' AND year(l_shipdate) = 1996
      GROUP BY ROLLUP(p_type, p_brand)
      ORDER BY lochierarchy DESC,
               CASE WHEN lochierarchy = 0 THEN p_type END NULLS FIRST,
               rank_within_parent, p_type NULLS FIRST, p_brand NULLS FIRST
      LIMIT 100""",

    // q89: monthly brand x store sums vs the (type, brand, store) windowed
    // average, kept when deviating more than 10%
    "ds_deviation_brand_store" -> """
      SELECT * FROM (
        SELECT p_type, p_brand, s_name, month(l_shipdate) AS moy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_sales,
               CAST(SUM(SUM(CAST(l_extendedprice AS DECIMAL(16,2))))
                      OVER (PARTITION BY p_type, p_brand, s_name) AS DOUBLE)
                 / count(*) OVER (PARTITION BY p_type, p_brand, s_name) AS avg_monthly_sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
             JOIN supplier ON s_suppkey = l_suppkey
        WHERE year(l_shipdate) = 1996
          AND ((p_type IN ('PROMO', 'STANDARD') AND p_size BETWEEN 1 AND 15)
            OR (p_type IN ('LARGE', 'MEDIUM') AND p_size BETWEEN 16 AND 30))
        GROUP BY p_type, p_brand, s_name, month(l_shipdate)) tmp1
      WHERE CASE WHEN avg_monthly_sales <> 0
                 THEN abs(sum_sales - avg_monthly_sales) / avg_monthly_sales END > 0.1
      ORDER BY sum_sales - avg_monthly_sales, s_name, p_type, p_brand, moy
      LIMIT 100""",

    // q91: call-center loss report — returns value grouped by priority and
    // segment under OR'd demographic bands in one month
    "ds_call_center_loss" -> """
      SELECT o_orderpriority AS call_center, c_mktsegment AS manager,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS returns_loss
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R' AND year(l_shipdate) = 1996 AND month(l_shipdate) = 12
        AND ((c_mktsegment = 'BUILDING' AND c_acctbal < 0)
          OR (c_mktsegment = 'MACHINERY' AND c_acctbal > 5000))
        AND substring(n_name, 8, 1) = '1'
      GROUP BY o_orderpriority, c_mktsegment
      ORDER BY returns_loss DESC, call_center, manager
      LIMIT 100""",

    // q92: the web-leg excess-discount twin of q32
    "ds_web_excess_discount" -> """
      SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(16,2))
                   * CAST(l1.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS excess_discount_amount
      FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      WHERE p_size BETWEEN 6 AND 10 AND l1.l_linestatus = 'O'
        AND l1.l_shipdate BETWEEN '1997-02-01' AND '1997-04-30'
        AND CAST(l1.l_extendedprice AS DECIMAL(16,2)) * CAST(l1.l_discount AS DECIMAL(4,2)) >
            (SELECT 1.3 * CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(16,2))
                                  * CAST(l2.l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*)
             FROM lineitem l2
             WHERE l2.l_partkey = l1.l_partkey AND l2.l_linestatus = 'O'
               AND l2.l_shipdate BETWEEN '1997-02-01' AND '1997-04-30')
      ORDER BY excess_discount_amount
      LIMIT 100""",

    // q94: ship-window order stats where a second line ships from a
    // different supplier and nothing was returned
    "ds_cross_warehouse_orders" -> """
      SELECT count(DISTINCT o_orderkey) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total_shipping_cost,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))
                      * CAST(0.05 AS DECIMAL(4,2))) AS DOUBLE) AS total_net_profit
      FROM orders o1 JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE o_orderdate BETWEEN '1996-05-01' AND '1996-06-30'
        AND n_name = 'NATION_2'
        AND EXISTS (SELECT 1 FROM lineitem l1 JOIN lineitem l2
                      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
                    WHERE l1.l_orderkey = o1.o_orderkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem lr
                        WHERE lr.l_orderkey = o1.o_orderkey AND lr.l_returnflag = 'R')""",

    // q95: the q94 skeleton routed through a reused cross-supplier CTE, and
    // requiring a return against a cross-supplier order
    "ds_cross_warehouse_returned" -> """
      WITH lw AS (
        SELECT DISTINCT l1.l_orderkey AS ok
        FROM lineitem l1 JOIN lineitem l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey)
      SELECT count(DISTINCT o_orderkey) AS order_count,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))) AS DOUBLE) AS total_shipping_cost,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(16,2))
                      * CAST(0.05 AS DECIMAL(4,2))) AS DOUBLE) AS total_net_profit
      FROM orders JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
      WHERE o_orderdate BETWEEN '1996-04-01' AND '1996-05-31'
        AND n_name = 'NATION_4'
        AND o_orderkey IN (SELECT ok FROM lw)
        AND o_orderkey IN (SELECT l_orderkey FROM lineitem JOIN lw ON lw.ok = l_orderkey
                           WHERE l_returnflag = 'R')""",

    // q96: time-of-day count over the events fact (hour band, minute floor,
    // one event type)
    "ds_hour_minute_count" -> """
      SELECT count(*) AS cnt
      FROM events
      WHERE hour(ts) = 8 AND minute(ts) >= 30 AND event_type = 'click'
      ORDER BY cnt
      LIMIT 100"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
