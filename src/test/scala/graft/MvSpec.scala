package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.MaterializedViews

/** Asserts the transparent MV rewrite actually fires (plan-shape test,
  * SURVEY.md §5 "plan-shape tests" analog of suites/shape_check/). */
class MvSpec extends AnyFunSuite {
  import TestSpark._

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("partition-incremental refresh rewrites only the stale partition's files") {
    import java.io.File
    def partFiles(dir: String): Map[String, Long] = {
      val d = new File(dir)
      if (!d.isDirectory) Map.empty
      else d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_"))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    // running the declared query performs: build base -> create MV ->
    // update 1996 -> refresh. Re-drive the steps here so we can capture
    // the MV file state between create and refresh.
    val baseDir = "target/mvp_base_spec"
    val mvRoot = "target/mv"
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.load(spark, sf, "lineitem")
      .select(year(col("l_shipdate")).as("yr"), col("l_suppkey"),
        col("l_extendedprice").cast(DecimalType(16, 2)).as("ext"))
    li.write.mode("overwrite").partitionBy("yr").parquet(baseDir)
    MaterializedViews.createPartitioned(spark, "mv_part_spec", baseDir, "yr",
      groupCols = Seq("l_suppkey"), sumCols = Seq("ext"))
    val untouched1995 = partFiles(s"$mvRoot/mv_part_spec/yr=1995")
    val before1996 = partFiles(s"$mvRoot/mv_part_spec/yr=1996")
    assert(untouched1995.nonEmpty && before1996.nonEmpty)
    // update ONE base partition
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    li.filter(col("yr") === 1996)
      .withColumn("ext", (col("ext") * 2).cast(DecimalType(16, 2)))
      .write.mode("overwrite").partitionBy("yr").parquet(baseDir)
    val refreshed = MaterializedViews.refreshPartitioned(spark, "mv_part_spec")
    assert(refreshed == Seq("1996"), s"stale set: $refreshed")
    // unchanged partition: same files, same mtimes — nothing rewritten
    assert(partFiles(s"$mvRoot/mv_part_spec/yr=1995") == untouched1995,
      "unchanged 1995 partition was rewritten")
    // stale partition: new files
    assert(partFiles(s"$mvRoot/mv_part_spec/yr=1996") != before1996,
      "stale 1996 partition was not rewritten")
    // a no-op refresh touches nothing at all
    assert(MaterializedViews.refreshPartitioned(spark, "mv_part_spec").isEmpty)
    // and the refreshed MV content equals a from-scratch aggregate
    val fromMv = MaterializedViews.readPartitioned(spark, "mv_part_spec")
      .select(col("yr"), col("l_suppkey"),
        col(MaterializedViews.sumAlias("ext")).as("s"))
      .orderBy(col("yr"), col("l_suppkey")).collect()
    val fresh = spark.read.parquet(baseDir)
      .groupBy(col("yr"), col("l_suppkey")).agg(sum(col("ext")).as("s"))
      .orderBy(col("yr"), col("l_suppkey")).collect()
    assert(fromMv.sameElements(fresh))
  }

  test("eligible aggregate is rewritten to the MV scan") {
    val p = planOf("mv_rewrite_hit")
    assert(p.contains("mv_lineitem_rf_ls"), s"MV not used:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
  }

  test("filtered MV consumed when query filter matches definition") {
    val p = planOf("mv_rewrite_filtered")
    assert(p.contains("mv_li_flag_a"), s"filtered MV not used:\n$p")
    assert(!p.contains("lineitem.parquet"), s"base table still scanned:\n$p")
  }

  test("ineligible aggregate stays on the base table") {
    val p = planOf("mv_rewrite_miss")
    assert(!p.contains("mv_lineitem_rf_ls"), s"MV wrongly used:\n$p")
  }

  test("rewrite preserves results vs MV-less run") {
    val withMv = SparkEntry.queries("mv_rewrite_hit")(spark, sf).collect().toSeq
    MaterializedViews.drop("mv_lineitem_rf_ls")
    try {
      val without = Tables.load(spark, sf, "lineitem")
        .filter(col("l_linestatus") === "F")
        .groupBy(col("l_returnflag"))
        .agg(round(sum(col("l_quantity")), 2).as("sq"),
          count(lit(1)).as("n"),
          min(col("l_extendedprice")).as("mn"),
          max(col("l_extendedprice")).as("mx"),
          round(avg(col("l_quantity")), 4).as("aq"))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(withMv == without)
    } finally {
      // re-register for any later test
      MaterializedViews.create(spark, "mv_lineitem_rf_ls", sf, "lineitem",
        groupCols = Seq("l_returnflag", "l_linestatus"),
        sumCols = Seq("l_quantity"),
        minCols = Seq("l_extendedprice"), maxCols = Seq("l_extendedprice"))
    }
  }
}
