package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc timing main: `runMain graft.QuickTime <dir> <iters> <query>...`
  * — times each named query best-of-N with the noop sink (guide §1.4),
  * printing every iteration so warm-up and variance are visible. */
object QuickTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names) {
      val ts = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[qt] $n iter$i: $t%.3f s")
        t
      }
      println(f"[qt] $n BEST: ${ts.min}%.3f s (loadavg ${java.nio.file.Files
        .readString(java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0)})")
    }
    spark.stop()
  }
}
