package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** TPC-H-style relational battery, adapted to the narrowed fixture schema
  * (FIXTURES.md; reference suites: regression-test/suites/nereids_tpch_p0/,
  * query text tools/tpch-tools/queries/q1.sql..q22.sql). Exercises the
  * operator spine of SURVEY.md §2: scans with pushdown, all join types,
  * multi-phase hash aggregation, sorts/top-n, scalar+correlated
  * subqueries.
  */
object TpchQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1: full-scan aggregate, 4 aggregates + 3 avgs per group.
    "q1_pricing_summary" -> ((s, dir) => {
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") <= "1998-09-02")
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySumDbl(col("l_extendedprice")).as("sum_base_price"),
          revSumDbl(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          // ep*(1-d)*(1+t) in exact 1e-6-dollar integer units
          unitsToDbl(sum(revCents4(col("l_extendedprice"), col("l_discount"))
            * (lit(100L) + pct(col("l_tax")))), 1e6).as("sum_charge"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (moneySumDbl(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dbl(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Q3: 3-way join + top-n by computed aggregate.
    "q3_shipping_priority" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < "1997-06-01")
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > "1997-06-01")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // Q4: EXISTS correlated subquery -> left-semi join.
    "q4_order_priority" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
      val l = t(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // Q5: 6-way join with cycle-closing predicate (c_nationkey =
    // s_nationkey). Join order is scale-driven: the date filter prunes
    // orders ~7x at the scan, orders⋈lineitem (the two fact tables)
    // goes first so the biggest reduction happens before customer —
    // which broadcasts at test SF but must shuffle at 100 TB — enters;
    // supplier/nation/region stay broadcast-side.
    "q5_local_supplier" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation"); val r = t(s, dir, "region")
      o.join(l, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(c, col("c_custkey") === col("o_custkey") && col("c_nationkey") === col("s_nationkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Q6: single-table filter + global aggregate (predicate pushdown check).
    "q6_forecast_revenue" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
        .agg(unitsToDbl(sum(cents(col("l_extendedprice")) * pct(col("l_discount"))), 1e4)
          .as("revenue"))
    }),

    // Q7: self-join of nation via two roles (supp/cust), year extraction.
    "q7_volume_shipping" -> ((s, dir) => {
      val su = t(s, dir, "supplier"); val l = t(s, dir, "lineitem")
      val o = t(s, dir, "orders"); val c = t(s, dir, "customer")
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      su.join(l, col("s_suppkey") === col("l_suppkey"))
        .join(o, col("o_orderkey") === col("l_orderkey"))
        .join(c, col("c_custkey") === col("o_custkey"))
        .join(n1, col("s_nationkey") === col("sn_key"))
        .join(n2, col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
                (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") <= "1997-12-31")
        .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // Q8: market share — conditional aggregation ratio.
    "q8_market_share" -> ((s, dir) => {
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val l = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
      val c = t(s, dir, "customer"); val su = t(s, dir, "supplier")
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      p.join(l, col("p_partkey") === col("l_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("c_nationkey") === col("cn_key"))
        .join(n2, col("s_nationkey") === col("sn_key"))
        .join(r, col("cn_region") === col("r_regionkey"))
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") <= "1997-12-31")
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((unitsToDbl(sum(when(col("supp_nation") === "NATION_3",
            revCents4(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0L))), 1e4) /
          revSumDbl(col("l_extendedprice"), col("l_discount"))).as("mkt_share"))
        .orderBy(col("o_year"))
    }),

    // Q9: profit by nation and year (no partsupp in fixture; revenue-only).
    "q9_product_profit" -> ((s, dir) => {
      // lineitem⋈orders first: that's the pair the reference colocates
      // (tpch DDL colocate_with) — on a bucketed layout it joins with
      // no shuffle at all; the partkey shuffle happens once after, and
      // supplier/nation ride broadcasts
      val p = t(s, dir, "part").filter(col("p_name").like("%a%"))
      val l = t(s, dir, "lineitem"); val su = t(s, dir, "supplier")
      val o = t(s, dir, "orders"); val n = t(s, dir, "nation")
      l.join(o, col("o_orderkey") === col("l_orderkey"))
        .join(p, col("p_partkey") === col("l_partkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q10: returned items — join + group + top-n with wide group keys.
    "q10_returned_items" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, dir, "nation")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q12 (adapted: no l_shipmode) — join + conditional counts by priority band.
    "q12_late_lines" -> ((s, dir) => {
      val o = t(s, dir, "orders"); val l = t(s, dir, "lineitem")
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" || col("o_orderpriority") === "2-HIGH", 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" && col("o_orderpriority") =!= "2-HIGH", 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // Q13: left outer join + double aggregation (distribution of counts).
    // Orders are aggregated per custkey BEFORE the join (map-side combine
    // shrinks the fact side to ≤|customer| rows), so the join moves one
    // row per customer instead of one per order — at 100 TB that is the
    // difference between shuffling the orders fact and shuffling a
    // pre-reduced key list. count(o_orderkey) ≡ count(*) per group
    // (orderkey is non-null) and COALESCE(...,0) restores the
    // no-orders customers the left join would have counted.
    "q13_customer_distribution" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      val ordCounts = o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
      val perCust = c.join(ordCounts, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("n_ord"), lit(0L)).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q14: promo revenue percentage (conditional agg ratio over join).
    "q14_promo_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-09-01" && col("l_shipdate") < "1996-10-01")
      val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) * unitsToDbl(sum(when(col("p_type") === "PROMO",
            revCents4(col("l_extendedprice"), col("l_discount"))).otherwise(lit(0L))), 1e4) /
          revSumDbl(col("l_extendedprice"), col("l_discount"))).as("promo_revenue"))
    }),

    // Q15: scalar subquery on an aggregated derived table (top supplier).
    "q15_top_supplier" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
      val revenue = l.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
      val maxRev = revenue.agg(max(col("total_revenue")).as("m"))
      val su = t(s, dir, "supplier")
      su.join(revenue, col("s_suppkey") === col("supplier_no"))
        .join(maxRev, col("total_revenue") === col("m"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16 (adapted): NOT IN subquery + count(distinct).
    "q16_supplier_cnt" -> ((s, dir) => {
      val p = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      val l = t(s, dir, "lineitem")
      val badSupp = t(s, dir, "supplier").filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_key"))
      p.join(l, col("p_partkey") === col("l_partkey"))
        .join(badSupp, col("l_suppkey") === col("bad_key"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }),

    // Q17: correlated aggregate subquery (avg qty per part).
    "q17_small_quantity" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
      val avgQty = l.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity")) / count(lit(1)) * 0.5).as("half_avg"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("half_avg"))
        .agg((moneySumDbl(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    }),

    // Q18: IN subquery over grouped-having (large orders).
    "q18_large_orders" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val bigOrders = l.groupBy(col("l_orderkey").as("bok"))
        .agg(sum(col("l_quantity")).as("tot_qty"))
        .filter(col("tot_qty") > 150)
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(bigOrders, col("o_orderkey") === col("bok"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("tot_qty").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
    }),

    // Q19: disjunctive multi-range predicate over a join.
    "q19_discounted_revenue" -> ((s, dir) => {
      val l = t(s, dir, "lineitem"); val p = t(s, dir, "part")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3") && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
        .agg(revSumDbl(col("l_extendedprice"), col("l_discount")).as("revenue"))
    }),

    // Q20 (adapted): semi-join chain — suppliers that shipped PROMO parts heavily.
    "q20_promo_suppliers" -> ((s, dir) => {
      val promoParts = t(s, dir, "part").filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01")
      val heavy = l.join(promoParts, col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
      val su = t(s, dir, "supplier"); val n = t(s, dir, "nation")
      su.join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(n, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"))
        .orderBy(col("s_name"))
    }),

    // Q21 (adapted): exists + not-exists (anti) correlated on same table.
    // The EXISTS (other supplier) / NOT EXISTS (other supplier shipped
    // later) pair is computed as per-orderkey WINDOW aggregates over ONE
    // pass of lineitem — a single shuffle on l_orderkey — instead of two
    // lineitem self-joins (which at sf0.1 broadcast-build the fact table
    // twice, and at 100 TB would be two extra fact-fact shuffles):
    //   another supplier exists      <=> min(suppkey) != max(suppkey)
    //   other supplier shipped later <=> (an achiever of max(shipdate)
    //     differs from this row's supplier and m1 > sd) or (this row's
    //     supplier is the sole achiever and max-shipdate-of-others > sd)
    "q21_waiting_supplier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_orderkey")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val su = t(s, dir, "supplier")
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .withColumn("minsk", min(col("l_suppkey")).over(w))
        .withColumn("maxsk", max(col("l_suppkey")).over(w))
        .withColumn("m1", max(col("l_shipdate")).over(w))
      val ach = l
        .withColumn("achMin", min(when(col("l_shipdate") === col("m1"), col("l_suppkey"))).over(w))
        .withColumn("achMax", max(when(col("l_shipdate") === col("m1"), col("l_suppkey"))).over(w))
      val scored = ach
        .withColumn("m2ex",
          max(when(col("l_suppkey") =!= col("achMax"), col("l_shipdate"))).over(w))
      val waiting = scored
        .filter(col("minsk") =!= col("maxsk"))
        .withColumn("laterOther",
          when(col("achMin") =!= col("achMax") || col("achMax") =!= col("l_suppkey"),
            col("m1") > col("l_shipdate"))
            .otherwise(coalesce(col("m2ex") > col("l_shipdate"), lit(false))))
        .filter(!col("laterOther"))
      waiting.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(su, col("s_suppkey") === col("l_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // Q22 (adapted): scalar avg subquery + NOT EXISTS + group.
    "q22_global_sales" -> ((s, dir) => {
      val c = t(s, dir, "customer").withColumn("cntrycode", pmod(col("c_nationkey"), lit(10)))
      val avgBal = t(s, dir, "customer").filter(col("c_acctbal") > 0)
        .agg((moneySumDbl(col("c_acctbal")) / count(lit(1))).as("ab"))
      val o = t(s, dir, "orders").filter(col("o_orderdate") >= "1999-01-01").select(col("o_custkey"))
      c.join(avgBal).filter(col("c_acctbal") > col("ab"))
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"), moneySumDbl(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("cntrycode"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(${oMoneySum("l_extendedprice")} AS DOUBLE) AS sum_base_price,
        CAST($oRev AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        sum(l_quantity) / count(*) AS avg_qty,
        CAST(${oMoneySum("l_extendedprice")} AS DOUBLE) / count(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "q3_shipping_priority" -> s"""
      SELECT l_orderkey, o_orderdate, CAST($oRev AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01'
        AND l_shipdate > TIMESTAMP '1997-06-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""",

    "q4_order_priority" -> """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
        AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q5_local_supplier" -> s"""
      SELECT n_name, CAST($oRev AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "q6_forecast_revenue" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""",

    "q7_volume_shipping" -> s"""
      SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS l_year,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol
        FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      ) shipping GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""",

    "q8_market_share" -> s"""
      SELECT o_year,
        CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
          / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
          CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
          n2.n_name AS supp_nation
        FROM part JOIN lineitem ON p_partkey = l_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      ) all_nations GROUP BY o_year ORDER BY o_year""",

    "q9_product_profit" -> s"""
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        CAST($oRev AS DOUBLE) AS sum_profit
      FROM part JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%a%'
      GROUP BY n_name, o_year ORDER BY nation, o_year DESC""",

    "q10_returned_items" -> s"""
      SELECT c_custkey, c_name, c_acctbal, n_name, CAST($oRev AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",

    "q12_late_lines" -> """
      SELECT l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus""",

    "q13_customer_distribution" -> """
      SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
      ) c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",

    "q14_promo_revenue" -> s"""
      SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
          THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
          ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        / CAST($oRev AS DOUBLE) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'""",

    "q15_top_supplier" -> s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no, CAST($oRev AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey""",

    "q16_supplier_cnt" -> """
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1,4,9,14,19,24,29,34)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",

    "q17_small_quantity" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#13'
        AND l_quantity < (SELECT sum(l_quantity) / count(*) * 0.5 FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)""",

    "q18_large_orders" -> """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum(l_quantity) AS sum_qty
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",

    "q19_discounted_revenue" -> s"""
      SELECT CAST($oRev AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""",

    "q20_promo_suppliers" -> """
      SELECT s_name, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      ORDER BY s_name""",

    "q21_waiting_supplier" -> """
      SELECT s_name, count(*) AS numwait
      FROM lineitem l1 JOIN orders ON o_orderkey = l1.l_orderkey
        JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey AND l3.l_shipdate > l1.l_shipdate)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",

    "q22_global_sales" -> """
      SELECT cntrycode, count(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM (
        SELECT c_nationkey % 10 AS cntrycode, c_acctbal, c_custkey FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
                           FROM customer WHERE c_acctbal > 0)
      ) custsale
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY cntrycode ORDER BY cntrycode"""
  )
}
