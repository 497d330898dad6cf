package graft
import org.apache.spark.sql.SparkSession
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    // persist + materialize all fixture tables
    Tables.names.foreach { n => Tables.load(spark, sfDir, n).persist().count() }
    for (n <- SparkEntry.benchQueries; _ <- 1 to 1) {
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"$n: $best%.3f")
    }
    spark.stop()
  }
}
