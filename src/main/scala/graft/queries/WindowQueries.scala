package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Window-function battery (SURVEY.md §2.6; reference:
  * be/src/exec/operator/analytic_sink_operator.h:177 frame evaluation,
  * be/src/exprs/aggregate/aggregate_function_window.h ranking/analytic
  * functions, partition_sort_sink_operator.h:70 partition top-n).
  *
  * Every ORDER BY inside a window ends with a unique key so rank
  * assignment is deterministic cross-engine.
  */
object WindowQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ranking family over a deterministic total order.
    "win_ranking" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          round(percent_rank().over(w), 9).as("prk"),
          round(cume_dist().over(w), 9).as("cd"),
          ntile(4).over(w).as("nt"))
        .filter(col("rn") <= 5)
        .orderBy(col("o_orderpriority"), col("rn"))
    }),

    "win_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"),
          lag(col("c_custkey"), 1).over(w).as("prev_k"),
          lag(col("c_custkey"), 2, -1).over(w).as("prev2_k"),
          lead(col("c_custkey"), 1).over(w).as("next_k"))
        .orderBy(col("c_nationkey"), col("c_custkey")).limit(500)
    }),

    // ROWS frames: sliding + running, exact decimal sums.
    "win_frames_rows" -> ((s, dir) => {
      val byDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").filter(col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(money(col("o_totalprice")))
            .over(byDate.rowsBetween(-2, 0))).as("sliding3"),
          dbl(sum(money(col("o_totalprice")))
            .over(byDate.rowsBetween(Window.unboundedPreceding, 0))).as("running"),
          count(lit(1)).over(byDate.rowsBetween(0, Window.unboundedFollowing)).as("n_after"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame with a numeric offset.
    "win_frames_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_size"))
      t(s, dir, "part").filter(col("p_partkey") < 400)
        .select(col("p_brand"), col("p_partkey"), col("p_size"),
          count(lit(1)).over(w.rangeBetween(-5, 0)).as("n_within5"),
          dbl(sum(money(col("p_retailprice"))).over(w.rangeBetween(-5, 5))).as("price_band"))
        .orderBy(col("p_brand"), col("p_partkey"))
    }),

    "win_first_last_nth" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders").filter(col("o_orderkey") < 3000)
        .select(col("o_orderpriority"), col("o_orderkey"),
          first(col("o_orderkey")).over(full).as("top_key"),
          last(col("o_orderkey")).over(full).as("bottom_key"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // any aggregate as a window fn + ratio-to-report.
    "win_agg_ratio" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
      t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          (dbl(money(col("l_extendedprice")) * lit(100)) /
            dbl(sum(money(col("l_extendedprice"))).over(w))).as("pct"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    }),

    // partition top-n — Doris PartitionTopN (reference:
    // partition_sort_sink_operator.h:70,
    // nereids CreatePartitionTopNFromWindow.java); Spark plans
    // WindowGroupLimit before the full window when filtering rn<=k.
    "win_partition_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rn"))
    })
  )

  def oracle: Map[String, String] = Map(
    "win_ranking" -> """
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey,
               row_number() OVER w AS rn, rank() OVER w AS rk,
               dense_rank() OVER w AS drk,
               round(percent_rank() OVER w, 9) AS prk,
               round(cume_dist() OVER w, 9) AS cd,
               ntile(4) OVER w AS nt
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
      ) x WHERE rn <= 5 ORDER BY o_orderpriority, rn""",

    "win_lag_lead" -> """
      SELECT c_nationkey, c_custkey,
             lag(c_custkey, 1) OVER w AS prev_k,
             lag(c_custkey, 2, -1) OVER w AS prev2_k,
             lead(c_custkey, 1) OVER w AS next_k
      FROM customer WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
      ORDER BY c_nationkey, c_custkey LIMIT 500""",

    "win_frames_rows" -> """
      SELECT o_custkey, o_orderkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running,
             COUNT(*) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_after
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey""",

    "win_frames_range" -> """
      SELECT p_brand, p_partkey, p_size,
             COUNT(*) OVER (PARTITION BY p_brand ORDER BY p_size
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within5,
             CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) OVER
               (PARTITION BY p_brand ORDER BY p_size
                RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS DOUBLE) AS price_band
      FROM part WHERE p_partkey < 400
      ORDER BY p_brand, p_partkey""",

    "win_first_last_nth" -> """
      SELECT o_orderpriority, o_orderkey,
             first_value(o_orderkey) OVER w AS top_key,
             last_value(o_orderkey) OVER w AS bottom_key,
             nth_value(o_orderkey, 2) OVER w AS second_key
      FROM orders WHERE o_orderkey < 3000
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_orderpriority, o_orderkey""",

    "win_agg_ratio" -> """
      SELECT l_returnflag, l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                   OVER (PARTITION BY l_returnflag) AS DOUBLE) AS pct
      FROM lineitem WHERE l_orderkey < 2000
      ORDER BY l_returnflag, l_orderkey, l_linenumber""",

    "win_partition_topn" -> """
      SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) x
      WHERE rn <= 3 ORDER BY c_nationkey, rn"""
  )
}
