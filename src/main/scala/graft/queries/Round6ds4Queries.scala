package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 TPC-DS widening, batch 4: sixteen more shapes toward the
  * full 99-query battery — the week-sequence day-pivot ratio join
  * (q2), the OR-of-EXISTS multi-channel demographic reports (q10 and
  * q35, the latter with stats spelled from exact BIGINT sums), the
  * shared-CTE net-paid HAVING-share report (q24), six-band
  * count-distinct scalars (q28), the sold/returned/re-bought
  * three-leg max report (q29), customer return detail above the
  * nation average (q30, same skeleton as its catalog twin q81),
  * correlated excess discount (q32), line-count ticket bands
  * (q34, same skeleton as q73), the two-leg inventory item window
  * (q37, same skeleton as q82), the consecutive-month
  * coefficient-of-variation self-join (q39), before/after pivot
  * sales with returns credited back (q40), the correlated
  * attribute-combo product list (q41), category month revenue (q42),
  * the per-store weekday CASE pivot (q43), and the OR(zip-list,
  * item-list) selector (q45, the IN-subquery disjunction joined as a
  * distinct flag so it stays portable).
  *
  * Re-expression conventions as batches 1-3 (channels = l_returnflag
  * legs or orders-vs-lineitem, item = part, store/warehouse =
  * supplier, address = nation/region, demographics = c_mktsegment /
  * c_acctbal bands, date_dim = year()/month()/quarter()/weekofyear()
  * on shipdate/orderdate; day-of-week pivots use mod(day(d), 7)
  * buckets because day-name functions are not portable across the
  * two engines). Averages are SUM(DECIMAL)/count; stddev_samp is
  * derived from exact integer power sums so both engines compute the
  * identical double; money stays DECIMAL until a final DOUBLE cast;
  * ORDER BY under LIMIT carries a full tiebreak.
  *
  * Reference shapes: tools/tpcds-tools/queries/sf1/query{2,10,24,28,
  * 29,30,32,34,35,37,39,40,41,42,43,45}.sql (q30 also covers the q81
  * skeleton, q34 covers q73, q37 covers q82).
  */
object Round6ds4Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q2: weekly pseudo-weekday pivot over the union of two channels, two
    // year legs joined on the same ISO week, per-day ratios
    "ds_weekseq_pivot_ratio" -> """
      WITH sales AS (
        SELECT o_orderdate AS d, CAST(o_totalprice AS DECIMAL(16,2)) AS amt FROM orders
        UNION ALL
        SELECT l_shipdate, CAST(l_extendedprice AS DECIMAL(16,2)) FROM lineitem),
      wk AS (
        SELECT year(d) AS yr, weekofyear(d) AS wk,
               SUM(CASE WHEN mod(day(d), 7) = 0 THEN amt END) AS d0,
               SUM(CASE WHEN mod(day(d), 7) = 1 THEN amt END) AS d1,
               SUM(CASE WHEN mod(day(d), 7) = 2 THEN amt END) AS d2,
               SUM(CASE WHEN mod(day(d), 7) = 3 THEN amt END) AS d3,
               SUM(CASE WHEN mod(day(d), 7) = 4 THEN amt END) AS d4,
               SUM(CASE WHEN mod(day(d), 7) = 5 THEN amt END) AS d5,
               SUM(CASE WHEN mod(day(d), 7) = 6 THEN amt END) AS d6
        FROM sales GROUP BY year(d), weekofyear(d))
      SELECT a.wk AS week_seq,
             CAST(a.d0 AS DOUBLE) / CAST(b.d0 AS DOUBLE) AS r0,
             CAST(a.d1 AS DOUBLE) / CAST(b.d1 AS DOUBLE) AS r1,
             CAST(a.d2 AS DOUBLE) / CAST(b.d2 AS DOUBLE) AS r2,
             CAST(a.d3 AS DOUBLE) / CAST(b.d3 AS DOUBLE) AS r3,
             CAST(a.d4 AS DOUBLE) / CAST(b.d4 AS DOUBLE) AS r4,
             CAST(a.d5 AS DOUBLE) / CAST(b.d5 AS DOUBLE) AS r5,
             CAST(a.d6 AS DOUBLE) / CAST(b.d6 AS DOUBLE) AS r6
      FROM wk a JOIN wk b ON a.wk = b.wk AND a.yr = 1996 AND b.yr = 1997
      ORDER BY week_seq""",

    // q10: demographic counts for customers active in the store channel AND
    // (web channel OR catalog channel) in one quarter
    "ds_demo_counts_exists" -> """
      SELECT c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             count(*) AS cnt1, count(*) AS cnt2, count(*) AS cnt3
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND year(o.o_orderdate) = 1996 AND month(o.o_orderdate) BETWEEN 3 AND 6)
        AND (EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                     WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'N'
                       AND year(l.l_shipdate) = 1996 AND month(l.l_shipdate) BETWEEN 3 AND 6)
             OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                        WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
                          AND year(l.l_shipdate) = 1996 AND month(l.l_shipdate) BETWEEN 3 AND 6))
      GROUP BY c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT)
      ORDER BY c_mktsegment, bal_band
      LIMIT 100""",

    // q24: net-paid per customer x supplier from a shared CTE, outer filter on
    // one item attribute, HAVING above 5% of the CTE-wide per-row average
    "ds_net_paid_above_share" -> """
      WITH ssales AS (
        SELECT c_name, s_name, n_name AS cust_nation, p_type,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS netpaid
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN nation ON n_nationkey = c_nationkey
             JOIN part ON p_partkey = l_partkey
        WHERE c_nationkey <> s_nationkey AND l_returnflag = 'R'
        GROUP BY c_name, s_name, n_name, p_type)
      SELECT c_name, s_name, CAST(SUM(netpaid) AS DOUBLE) AS paid
      FROM ssales
      WHERE p_type = 'PROMO'
      GROUP BY c_name, s_name
      HAVING SUM(netpaid) > (SELECT 0.05 * CAST(SUM(netpaid) AS DOUBLE) / count(*) FROM ssales)
      ORDER BY c_name, s_name
      LIMIT 100""",

    // q28: six quantity-band derived tables (exact avg, count, count
    // distinct under OR'd price bands) cross-joined into one row
    "ds_six_band_distinct_scalars" -> """
      SELECT * FROM
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b1_lp,
              count(*) AS b1_cnt, count(DISTINCT l_quantity) AS b1_cntd
       FROM lineitem WHERE l_quantity BETWEEN 1 AND 5
         AND (l_extendedprice BETWEEN 10000 AND 20000 OR l_discount BETWEEN 0.02 AND 0.04
              OR l_tax BETWEEN 0.02 AND 0.04)) b1,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b2_lp,
              count(*) AS b2_cnt, count(DISTINCT l_quantity) AS b2_cntd
       FROM lineitem WHERE l_quantity BETWEEN 6 AND 10
         AND (l_extendedprice BETWEEN 20000 AND 30000 OR l_discount BETWEEN 0.03 AND 0.05
              OR l_tax BETWEEN 0.03 AND 0.05)) b2,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b3_lp,
              count(*) AS b3_cnt, count(DISTINCT l_quantity) AS b3_cntd
       FROM lineitem WHERE l_quantity BETWEEN 11 AND 15
         AND (l_extendedprice BETWEEN 30000 AND 40000 OR l_discount BETWEEN 0.04 AND 0.06
              OR l_tax BETWEEN 0.04 AND 0.06)) b3,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b4_lp,
              count(*) AS b4_cnt, count(DISTINCT l_quantity) AS b4_cntd
       FROM lineitem WHERE l_quantity BETWEEN 16 AND 20
         AND (l_extendedprice BETWEEN 40000 AND 50000 OR l_discount BETWEEN 0.05 AND 0.07
              OR l_tax BETWEEN 0.05 AND 0.07)) b4,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b5_lp,
              count(*) AS b5_cnt, count(DISTINCT l_quantity) AS b5_cntd
       FROM lineitem WHERE l_quantity BETWEEN 21 AND 25
         AND (l_extendedprice BETWEEN 50000 AND 60000 OR l_discount BETWEEN 0.06 AND 0.08
              OR l_tax BETWEEN 0.06 AND 0.08)) b5,
      (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) / count(*) AS b6_lp,
              count(*) AS b6_cnt, count(DISTINCT l_quantity) AS b6_cntd
       FROM lineitem WHERE l_quantity BETWEEN 26 AND 30
         AND (l_extendedprice BETWEEN 60000 AND 70000 OR l_discount BETWEEN 0.07 AND 0.09
              OR l_tax BETWEEN 0.07 AND 0.09)) b6
      LIMIT 100""",

    // q29: sold / returned / re-bought max-quantity report across three
    // fact legs with three distinct date windows
    "ds_sale_return_resale_max" -> """
      SELECT p_brand, s_name,
             CAST(max(sale.l_quantity) AS DOUBLE) AS store_sales_quantity,
             CAST(max(ret.l_quantity) AS DOUBLE) AS store_returns_quantity,
             CAST(max(re.l_quantity) AS DOUBLE) AS catalog_sales_quantity
      FROM lineitem sale
           JOIN lineitem ret ON ret.l_partkey = sale.l_partkey AND ret.l_returnflag = 'R'
           JOIN lineitem re ON re.l_partkey = sale.l_partkey
                AND re.l_suppkey = sale.l_suppkey AND re.l_returnflag = 'N'
           JOIN part ON p_partkey = sale.l_partkey
           JOIN supplier ON s_suppkey = sale.l_suppkey
      WHERE sale.l_returnflag = 'A'
        AND year(sale.l_shipdate) = 1996 AND month(sale.l_shipdate) = 4
        AND year(ret.l_shipdate) = 1996 AND month(ret.l_shipdate) BETWEEN 4 AND 7
        AND year(re.l_shipdate) IN (1996, 1997, 1998)
      GROUP BY p_brand, s_name
      ORDER BY p_brand, s_name
      LIMIT 100""",

    // q30/q81: per-customer returns total by nation, kept when above 1.2x the
    // nation average (correlated over the reused CTE), customer detail output
    "ds_customer_return_detail" -> """
      WITH ctr AS (
        SELECT o_custkey AS ctr_cust, c_nationkey AS ctr_nation,
               SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS ctr_total
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
        WHERE l_returnflag = 'R' AND year(l_shipdate) = 1997
        GROUP BY o_custkey, c_nationkey)
      SELECT c_name, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal,
             CAST(ctr_total AS DOUBLE) AS total_return
      FROM ctr ctr1 JOIN customer ON c_custkey = ctr_cust
           JOIN nation ON n_nationkey = c_nationkey
      WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        AND ctr_total > (SELECT 1.2 * CAST(SUM(ctr_total) AS DOUBLE) / count(*)
                         FROM ctr ctr2 WHERE ctr2.ctr_nation = ctr1.ctr_nation)
      ORDER BY c_name, c_mktsegment, acctbal, total_return
      LIMIT 100""",

    // q32: excess discount — discount amounts above 1.3x the per-item
    // average inside a 90-day window (correlated per-item average)
    "ds_excess_discount" -> """
      SELECT CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(16,2))
                   * CAST(l1.l_discount AS DECIMAL(4,2))) AS DOUBLE) AS excess_discount_amount
      FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      WHERE p_size BETWEEN 1 AND 5
        AND l1.l_shipdate BETWEEN '1996-03-01' AND '1996-05-30'
        AND CAST(l1.l_extendedprice AS DECIMAL(16,2)) * CAST(l1.l_discount AS DECIMAL(4,2)) >
            (SELECT 1.3 * CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(16,2))
                                  * CAST(l2.l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*)
             FROM lineitem l2
             WHERE l2.l_partkey = l1.l_partkey
               AND l2.l_shipdate BETWEEN '1996-03-01' AND '1996-05-30')""",

    // q34/q73: orders whose line count lands in a band on month-edge days,
    // joined back to customer detail
    "ds_ticket_band_customers" -> """
      SELECT c_name, c_mktsegment, ok AS ticket_number, cnt
      FROM (SELECT o_orderkey AS ok, o_custkey AS ck, count(*) AS cnt
            FROM orders JOIN lineitem ON l_orderkey = o_orderkey
            WHERE (day(o_orderdate) BETWEEN 1 AND 3 OR day(o_orderdate) BETWEEN 25 AND 28)
              AND o_orderpriority IN ('1-URGENT', '5-LOW')
              AND year(o_orderdate) IN (1996, 1997, 1998)
            GROUP BY o_orderkey, o_custkey) dn
           JOIN customer ON c_custkey = ck
      WHERE cnt BETWEEN 5 AND 8
      ORDER BY c_name, c_mktsegment, ticket_number, cnt
      LIMIT 100""",

    // q35: the q10 skeleton with per-group stats; stddev_samp spelled from
    // exact BIGINT sums so both engines derive the identical double
    "ds_demo_stats_exists" -> """
      SELECT c_mktsegment, bal_band, count(*) AS cnt,
             CAST(SUM(bal_band) AS DOUBLE) / count(*) AS avg_band,
             sqrt(CAST(count(*) * SUM(bal_band * bal_band) - SUM(bal_band) * SUM(bal_band) AS DOUBLE)
                  / (count(*) * (count(*) - 1.0))) AS std_band,
             CAST(SUM(bal_band) AS BIGINT) AS sum_band
      FROM (SELECT c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   c_custkey
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND year(o.o_orderdate) = 1997 AND quarter(o.o_orderdate) < 4)
              AND (EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                           WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'N'
                             AND year(l.l_shipdate) = 1997 AND quarter(l.l_shipdate) < 4)
                   OR EXISTS (SELECT 1 FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                              WHERE o.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
                                AND year(l.l_shipdate) = 1997 AND quarter(l.l_shipdate) < 4))) t
      GROUP BY c_mktsegment, bal_band
      HAVING count(*) > 1
      ORDER BY c_mktsegment, bal_band
      LIMIT 100""",

    // q37/q82: item detail where the inventory leg (shipped quantity window)
    // and the sales leg both hit the same item
    "ds_inventory_item_window" -> """
      SELECT p_name, p_type, CAST(p_retailprice AS DOUBLE) AS current_price
      FROM part JOIN lineitem inv ON inv.l_partkey = p_partkey
           JOIN lineitem cs ON cs.l_partkey = p_partkey
      WHERE p_retailprice BETWEEN 920 AND 960
        AND p_brand IN ('Brand#5', 'Brand#15', 'Brand#25', 'Brand#35')
        AND inv.l_shipdate BETWEEN '1996-02-01' AND '1996-04-01'
        AND inv.l_quantity BETWEEN 10 AND 40
        AND cs.l_returnflag = 'N'
      GROUP BY p_name, p_type, p_retailprice
      ORDER BY p_name
      LIMIT 100""",

    // q39: monthly mean / stdev / coefficient-of-variation per
    // supplier x item, self-joined on consecutive months where cov is high
    "ds_inventory_cov_pair" -> """
      WITH inv AS (
        SELECT s_name, p_brand AS item, month(l_shipdate) AS m,
               count(*) AS n, SUM(CAST(day(l_shipdate) AS BIGINT)) AS sx,
               SUM(CAST(day(l_shipdate) AS BIGINT) * CAST(day(l_shipdate) AS BIGINT)) AS sx2
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
        WHERE year(l_shipdate) = 1996
        GROUP BY s_name, p_brand, month(l_shipdate)
        HAVING count(*) > 1),
      invcov AS (
        SELECT s_name, item, m,
               CAST(sx AS DOUBLE) / n AS mean,
               sqrt(CAST(n * sx2 - sx * sx AS DOUBLE) / (n * (n - 1.0))) AS stdev
        FROM inv)
      SELECT a.s_name, a.item, a.m AS moy1, a.mean AS mean1, a.stdev / a.mean AS cov1,
             b.m AS moy2, b.mean AS mean2, b.stdev / b.mean AS cov2
      FROM invcov a JOIN invcov b ON a.s_name = b.s_name AND a.item = b.item AND b.m = a.m + 1
      WHERE a.m = 3 AND a.stdev / a.mean > 0.2
      ORDER BY a.s_name, a.item, mean1, cov1, mean2, cov2
      LIMIT 100""",

    // q40: before/after net sales around a pivot date with returns credited
    // back via a pre-aggregated left join
    "ds_before_after_pivot" -> """
      SELECT n_name AS w_state, p_brand AS item_id,
             CAST(SUM(CASE WHEN l.l_shipdate < '1996-06-01'
                      THEN CAST(l.l_extendedprice AS DECIMAL(16,2)) - coalesce(r.ret, CAST(0 AS DECIMAL(16,2)))
                      ELSE CAST(0 AS DECIMAL(16,2)) END) AS DOUBLE) AS sales_before,
             CAST(SUM(CASE WHEN l.l_shipdate >= '1996-06-01'
                      THEN CAST(l.l_extendedprice AS DECIMAL(16,2)) - coalesce(r.ret, CAST(0 AS DECIMAL(16,2)))
                      ELSE CAST(0 AS DECIMAL(16,2)) END) AS DOUBLE) AS sales_after
      FROM lineitem l
           LEFT JOIN (SELECT l_orderkey AS rok, l_partkey AS rpk,
                             SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS ret
                      FROM lineitem WHERE l_returnflag = 'R'
                      GROUP BY l_orderkey, l_partkey) r
             ON r.rok = l.l_orderkey AND r.rpk = l.l_partkey
           JOIN part ON p_partkey = l.l_partkey
           JOIN supplier ON s_suppkey = l.l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE l.l_returnflag <> 'R'
        AND l.l_shipdate BETWEEN '1996-05-01' AND '1996-07-01'
        AND p_retailprice BETWEEN 920 AND 940
      GROUP BY n_name, p_brand
      ORDER BY w_state, item_id
      LIMIT 100""",

    // q41: distinct product names whose brand has at least one item matching
    // a deeply OR'd attribute-combination predicate (correlated count)
    "ds_manufact_combo_products" -> """
      SELECT DISTINCT p_name AS product_name
      FROM part p1
      WHERE p_size BETWEEN 10 AND 30
        AND (SELECT count(*) FROM part p2
             WHERE p2.p_brand = p1.p_brand
               AND ((p2.p_type = 'PROMO' AND p2.p_size IN (1, 2, 3, 4)
                     AND p2.p_retailprice BETWEEN 900 AND 950)
                 OR (p2.p_type = 'STANDARD' AND p2.p_size IN (5, 6, 7, 8)
                     AND p2.p_retailprice BETWEEN 910 AND 960)
                 OR (p2.p_type = 'LARGE' AND p2.p_size IN (9, 10, 11, 12)
                     AND p2.p_retailprice BETWEEN 920 AND 970)
                 OR (p2.p_type = 'ECONOMY' AND p2.p_size IN (13, 14, 15, 16)
                     AND p2.p_retailprice BETWEEN 930 AND 980))) > 0
      ORDER BY product_name
      LIMIT 100""",

    // q42: category revenue for one manager band in one month
    "ds_category_month_revenue" -> """
      SELECT year(l_shipdate) AS d_year, p_type AS category,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_sales
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_size = 1 AND month(l_shipdate) = 11 AND year(l_shipdate) = 1996
      GROUP BY year(l_shipdate), p_type
      ORDER BY sum_sales DESC, d_year, category
      LIMIT 100""",

    // q43: per-store pseudo-weekday CASE pivot over one year
    "ds_store_weekday_pivot" -> """
      SELECT s_name,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 0 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d0_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 1 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d1_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 2 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d2_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 3 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d3_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 4 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d4_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 5 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d5_sales,
             CAST(SUM(CASE WHEN mod(day(l_shipdate), 7) = 6 THEN CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS d6_sales
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE year(l_shipdate) = 1996 AND substring(n_name, 8, 1) IN ('1', '2')
      GROUP BY s_name
      ORDER BY s_name
      LIMIT 100""",

    // q45: zip/city sales under OR(zip-list membership, item in a
    // key-selected list) — the list leg joined as a distinct flag so the
    // disjunction stays portable
    "ds_zip_city_or_itemlist" -> """
      SELECT n_name AS ca_zip, c_mktsegment AS ca_city,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS sum_sales
      FROM lineitem
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           JOIN part p ON p.p_partkey = l_partkey
           LEFT JOIN (SELECT DISTINCT p_name AS sel_name FROM part
                      WHERE p_partkey IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)) sel
             ON sel.sel_name = p.p_name
      WHERE (substring(n_name, 8, 1) IN ('2', '4', '6', '8') OR sel.sel_name IS NOT NULL)
        AND year(l_shipdate) = 1996 AND quarter(l_shipdate) = 1
      GROUP BY n_name, c_mktsegment
      ORDER BY ca_zip, ca_city
      LIMIT 100"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
