package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc overhead probe: separates fixed job overhead from per-query
  * compute so perf work targets the real bottleneck. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n => Tables.load(spark, sfDir, n).persist().count() }

    def best(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $name: $t%.3f")
    }

    import org.apache.spark.sql.functions._
    val l = Tables.load(spark, sfDir, "lineitem")
    best("range_sum")(spark.range(600000).selectExpr("sum(id) s"))
    best("count_only")(l.groupBy().count())
    best("sum_double")(l.agg(sum(col("l_quantity"))))
    best("sum_decimal")(l.agg(sum(col("l_extendedprice").cast("decimal(12,2)"))))
    best("groupby_sum_decimal")(l.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)"))))
    best("q1_full")(SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    best("q21_full")(SparkEntry.queries("q21_waiting_supplier")(spark, sfDir))
    spark.stop()
  }
}
