package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.MaterializedViews
import Q._

/** Materialized-view battery. Correctness here is rewrite-independent
  * (the rule must never change results); MvSpec asserts the rewrite
  * actually fires by inspecting the physical plan's scan paths.
  */
object MvQueries {

  private def ensureMv(s: SparkSession, dir: String): Unit =
    MaterializedViews.create(s, "mv_lineitem_rf_ls", dir, "lineitem",
      groupCols = Seq("l_returnflag", "l_linestatus"),
      sumCols = Seq("l_quantity"),
      minCols = Seq("l_extendedprice"),
      maxCols = Seq("l_extendedprice"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // eligible: rewritten to the MV scan (asserted in MvSpec).
    "mv_rewrite_hit" -> ((s, dir) => {
      ensureMv(s, dir)
      t(s, dir, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"),
          round(avg(col("l_quantity")), 4).as("aq"))
        .orderBy(col("l_returnflag"))
    }),

    // filtered MV: the query's filter textually matches the MV's
    // definition filter and is consumed by the rewrite.
    "mv_rewrite_filtered" -> ((s, dir) => {
      MaterializedViews.create(s, "mv_li_flag_a", dir, "lineitem",
        groupCols = Seq("l_suppkey"), sumCols = Seq("l_quantity"),
        filterSql = Some("l_returnflag = 'A'"))
      t(s, dir, "lineitem")
        .filter(col("l_returnflag") === "A")
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"), count(lit(1)).as("n"))
        .orderBy(col("l_suppkey"))
    }),

    // partition-incremental refresh (MTMVPartitionUtil analog): build a
    // year-partitioned base, materialize a partitioned MV, simulate a
    // late-arriving update to ONE year (1996 prices double), refresh —
    // only the stale partition rebuilds (file-level assert in MvSpec) —
    // and read the MV back; the oracle recomputes the same final state
    // from lineitem directly.
    "mv_partition_refresh" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val baseDir = "target/mvp_base"
      val li = t(s, dir, "lineitem")
        .select(year(col("l_shipdate")).as("yr"), col("l_suppkey"),
          col("l_extendedprice").cast(DecimalType(16, 2)).as("ext"))
      li.write.mode("overwrite").partitionBy("yr").parquet(baseDir)
      MaterializedViews.createPartitioned(s, "mv_part_supp", baseDir, "yr",
        groupCols = Seq("l_suppkey"), sumCols = Seq("ext"))
      // the update: overwrite just the 1996 base partition
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "dynamic")
      try li.filter(col("yr") === 1996)
        .withColumn("ext", (col("ext") * 2).cast(DecimalType(16, 2)))
        .write.mode("overwrite").partitionBy("yr").parquet(baseDir)
      finally prev match {
        case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key)
      }
      val refreshed = MaterializedViews.refreshPartitioned(s, "mv_part_supp")
      require(refreshed == Seq("1996"),
        s"expected exactly the 1996 partition stale, got $refreshed")
      MaterializedViews.readPartitioned(s, "mv_part_supp")
        .select(col("yr").cast("int").as("yr"), col("l_suppkey"),
          col(MaterializedViews.sumAlias("ext")).cast("double").as("total"),
          col(MaterializedViews.cntAlias).as("n"))
        .orderBy(col("yr"), col("l_suppkey"))
    }),

    // ineligible (distinct agg): must stay on the base table.
    "mv_rewrite_miss" -> ((s, dir) => {
      ensureMv(s, dir)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_suppkey")).as("nd"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    })
  )

  def oracle: Map[String, String] = Map(
    "mv_rewrite_hit" -> """
      SELECT l_returnflag, round(sum(l_quantity), 2) AS sq, count(*) AS n,
             min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
             round(avg(l_quantity), 4) AS aq
      FROM lineitem WHERE l_linestatus = 'F'
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "mv_rewrite_filtered" -> """
      SELECT l_suppkey, round(sum(l_quantity), 2) AS sq, count(*) AS n
      FROM lineitem WHERE l_returnflag = 'A'
      GROUP BY l_suppkey ORDER BY l_suppkey""",

    "mv_rewrite_miss" -> """
      SELECT l_returnflag, count(DISTINCT l_suppkey) AS nd, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "mv_partition_refresh" -> """
      SELECT CAST(year(l_shipdate) AS INT) AS yr, l_suppkey,
             CAST(SUM(CASE WHEN year(l_shipdate) = 1996
                           THEN CAST(CAST(l_extendedprice AS DECIMAL(16,2)) * 2 AS DECIMAL(16,2))
                           ELSE CAST(l_extendedprice AS DECIMAL(16,2)) END) AS DOUBLE) AS total,
             count(*) AS n
      FROM lineitem
      GROUP BY year(l_shipdate), l_suppkey
      ORDER BY yr, l_suppkey"""
  )
}
