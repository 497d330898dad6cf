package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Colocate / bucket-shuffle join analog (reference:
  * HashDistributionInfo.java:35 `DISTRIBUTED BY HASH(col) BUCKETS n`,
  * colocate join in the reference's TPC-H DDL
  * tools/tpch-tools/ddl/create-tpch-tables-sf1.sql:18-43).
  *
  * Spark equivalent: bucketed tables (`bucketBy` + `sortBy`) joined on
  * the bucket key — the join reads co-located buckets and plans NO
  * shuffle exchange on either side (asserted in BucketSpec). At 100 TB
  * this is the difference between a full-data shuffle and a local
  * merge per bucket.
  */
object BucketQueries {

  private val lock = new Object
  private def ensureBuckets(s: SparkSession, dir: String): Unit = lock.synchronized {
    if (!s.catalog.tableExists("b_orders")) {
      t(s, dir, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"target/warehouse/b_orders").saveAsTable("b_orders")
      t(s, dir, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"target/warehouse/b_lineitem").saveAsTable("b_lineitem")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // colocated orders-lineitem join: no shuffle on either side.
    "bucket_colocate_join" -> ((s, dir) => {
      ensureBuckets(s, dir)
      s.table("b_orders").join(s.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dbl(sum(rev(col("l_extendedprice"), col("l_discount")))).as("rev"))
        .orderBy(col("o_orderpriority"))
    }),

    // bucket-local aggregation: grouping on the bucket key reuses the
    // bucketing (no exchange before the agg).
    "bucket_local_agg" -> ((s, dir) => {
      ensureBuckets(s, dir)
      // per-order totals stay DECIMAL through both levels; one double
      // division at the end — order-independent, no rounding boundary.
      s.table("b_lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_lines"),
          sum(money(col("l_extendedprice"))).as("tot_dec"))
        .groupBy(col("n_lines"))
        .agg(count(lit(1)).as("n_orders"),
          (dbl(sum(col("tot_dec"))) / count(lit(1))).as("avg_tot"))
        .orderBy(col("n_lines"))
    })
  )

  def oracle: Map[String, String] = Map(
    "bucket_colocate_join" -> s"""
      SELECT o_orderpriority, count(*) AS n,
             CAST($oRev AS DOUBLE) AS rev
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'O'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "bucket_local_agg" -> """
      WITH per_order AS (
        SELECT l_orderkey, count(*) AS n_lines,
               SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS tot_dec
        FROM lineitem GROUP BY l_orderkey)
      SELECT n_lines, count(*) AS n_orders,
             CAST(SUM(tot_dec) AS DOUBLE) / count(*) AS avg_tot
      FROM per_order GROUP BY n_lines ORDER BY n_lines"""
  )
}
