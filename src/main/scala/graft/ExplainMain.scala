package graft
import org.apache.spark.sql.SparkSession
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- args) {
      println(s"===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
