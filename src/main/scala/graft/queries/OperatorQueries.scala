package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Join / set-operation / sort-limit operator battery
  * (SURVEY.md §2.4, §2.7, §2.8; reference: be/src/exec/operator/
  * hashjoin_probe_operator.h:32-44 join-type list,
  * set_sink_operator.h:71, union_sink_operator.h:72,
  * sort_sink_operator.h:56).
  */
object OperatorQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LEFT OUTER: customers with/without orders.
    "join_left_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_nationkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          dbl(sum(money(col("o_totalprice")))).as("tot"))
        .orderBy(col("c_nationkey"))
    }),

    // RIGHT OUTER (probe side preserved).
    "join_right_outer" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val c = t(s, dir, "customer")
      o.join(c, col("c_custkey") === col("o_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_orders"), count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    }),

    // FULL OUTER over two aggregated sides.
    "join_full_outer" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 7000)
        .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
      val su = t(s, dir, "supplier").filter(col("s_acctbal") > 3000)
        .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("ck") === col("sk"), "full")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // CROSS JOIN (nested-loop, no condition).
    "join_cross" -> ((s, dir) => {
      val r1 = t(s, dir, "region").select(col("r_name").as("r1"))
      val r2 = t(s, dir, "region").select(col("r_name").as("r2"))
      r1.crossJoin(r2).filter(col("r1") < col("r2")).orderBy(col("r1"), col("r2"))
    }),

    // Non-equi theta join (BroadcastNestedLoopJoin path).
    "join_nonequi_range" -> ((s, dir) => {
      val su = t(s, dir, "supplier").select(col("s_suppkey"), col("s_acctbal"))
      val c = t(s, dir, "customer").select(col("c_acctbal"))
      su.join(c, col("c_acctbal") > col("s_acctbal") - 100 &&
          col("c_acctbal") <= col("s_acctbal"))
        .groupBy(col("s_suppkey")).agg(count(lit(1)).as("n_close"))
        .orderBy(col("s_suppkey"))
    }),

    // NULL-aware anti join (NOT IN with nullable LHS) — Doris
    // NULL_AWARE_LEFT_ANTI (reference: join/null_aware_left_anti_join_impl.cpp).
    "join_null_aware_anti" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_mktsegment, count(*) AS n
        FROM customer
        WHERE nullif(c_nationkey, 7) NOT IN
          (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // UNION ALL with bucketed counts.
    "setop_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("key"))
      val su = t(s, dir, "supplier").select(col("s_suppkey").as("key"))
      c.union(su).groupBy(pmod(col("key"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n")).orderBy(col("bucket"))
    }),

    // UNION DISTINCT.
    "setop_union_distinct" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("key"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("key"))
      a.union(b).distinct()
        .groupBy(pmod(col("key"), lit(10)).as("bucket"))
        .agg(count(lit(1)).as("n")).orderBy(col("bucket"))
    }),

    // INTERSECT (distinct semantics).
    "setop_intersect" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("key"))
      val b = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("key"))
      a.intersect(b).orderBy(col("key")).limit(200)
    }),

    // EXCEPT (distinct semantics).
    "setop_except" -> ((s, dir) => {
      val a = t(s, dir, "customer").select(col("c_custkey").as("key"))
      val b = t(s, dir, "orders").select(col("o_custkey").as("key"))
      a.except(b).orderBy(col("key")).limit(200)
    }),

    // INTERSECT ALL / EXCEPT ALL (multiset semantics).
    "setop_intersect_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").filter(col("l_shipdate") < "1997-01-01")
        .select(col("l_partkey").as("key"))
      val b = t(s, dir, "lineitem").filter(col("l_shipdate") >= "1996-01-01")
        .select(col("l_partkey").as("key"))
      a.intersectAll(b).agg(count(lit(1)).as("n"))
    }),
    "setop_except_all" -> ((s, dir) => {
      val a = t(s, dir, "lineitem").filter(col("l_shipdate") < "1997-01-01")
        .select(col("l_partkey").as("key"))
      val b = t(s, dir, "lineitem").filter(col("l_shipdate") >= "1996-01-01")
        .select(col("l_partkey").as("key"))
      a.exceptAll(b).agg(count(lit(1)).as("n"))
    }),

    // Sort with NULLS FIRST/LAST + LIMIT/OFFSET.
    "sort_nulls_offset" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 100, lit(null)).otherwise(col("c_acctbal")).as("bal"))
        .orderBy(col("bal").asc_nulls_first, col("c_custkey"))
        .offset(5).limit(50)
    })
  )

  def oracle: Map[String, String] = Map(
    "join_left_outer" -> s"""
      SELECT c_nationkey, count(o_orderkey) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'O'
      GROUP BY c_nationkey ORDER BY c_nationkey""",

    "join_right_outer" -> """
      SELECT c_mktsegment, count(o_orderkey) AS n_orders, count(*) AS n_rows
      FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        RIGHT JOIN customer ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "join_full_outer" -> """
      SELECT COALESCE(ck, sk) AS nationkey, n_cust, n_supp FROM
        (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer WHERE c_acctbal > 7000 GROUP BY 1) c
      FULL JOIN
        (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier WHERE s_acctbal > 3000 GROUP BY 1) s
      ON ck = sk ORDER BY nationkey""",

    "join_cross" -> """
      SELECT r1.r_name AS r1, r2.r_name AS r2 FROM region r1 CROSS JOIN region r2
      WHERE r1.r_name < r2.r_name ORDER BY r1, r2""",

    "join_nonequi_range" -> """
      SELECT s_suppkey, count(*) AS n_close
      FROM supplier JOIN customer ON c_acctbal > s_acctbal - 100 AND c_acctbal <= s_acctbal
      GROUP BY s_suppkey ORDER BY s_suppkey""",

    "join_null_aware_anti" -> """
      SELECT c_mktsegment, count(*) AS n
      FROM customer
      WHERE nullif(c_nationkey, 7) NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "setop_union_all" -> """
      SELECT key % 10 AS bucket, count(*) AS n FROM (
        SELECT c_custkey AS key FROM customer UNION ALL SELECT s_suppkey FROM supplier
      ) u GROUP BY bucket ORDER BY bucket""",

    "setop_union_distinct" -> """
      SELECT key % 10 AS bucket, count(*) AS n FROM (
        SELECT o_custkey AS key FROM orders
        UNION SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      ) u GROUP BY bucket ORDER BY bucket""",

    "setop_intersect" -> """
      SELECT key FROM (
        SELECT o_custkey AS key FROM orders
        INTERSECT SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      ) u ORDER BY key LIMIT 200""",

    "setop_except" -> """
      SELECT key FROM (
        SELECT c_custkey AS key FROM customer
        EXCEPT SELECT o_custkey FROM orders
      ) u ORDER BY key LIMIT 200""",

    "setop_intersect_all" -> """
      SELECT count(*) AS n FROM (
        SELECT l_partkey AS key FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        INTERSECT ALL
        SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01') u""",

    "setop_except_all" -> """
      SELECT count(*) AS n FROM (
        SELECT l_partkey AS key FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        EXCEPT ALL
        SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01') u""",

    "sort_nulls_offset" -> """
      SELECT c_custkey, CASE WHEN c_acctbal < 100 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
      ORDER BY bal ASC NULLS FIRST, c_custkey LIMIT 50 OFFSET 5"""
  )
}
