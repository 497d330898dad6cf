package graft

import org.apache.spark.sql.SparkSession

/** One-question diagnostic (r16, VERDICT item 7): why does
  * `scale5x_ml_dedup_minhash` swing 3.97–6.02 s across rounds at
  * identical code? Times the entry N times INSIDE one JVM (after a
  * warm-up) and prints per-iteration wall time, GC-time delta, and
  * 1-min loadavg — if iterations converge within a run but differ
  * across runs/rounds, the swing is environment (load/GC/page cache),
  * not plan instability; if they swing within a run, something in the
  * plan (AQE partition counts, skew splits) is nondeterministic.
  * Findings land in NOTES_r16.md. */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_VP_ITERS", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    val out = s"target/scale/${new java.io.File(sfDir).getName}_x5"
    if (!new java.io.File(out, "documents.parquet").exists())
      ScaleProbe.build(spark, sfDir, out, 5)
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def loadavg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val fn = SparkEntry.queries("ml_dedup_minhash")
    // warm-up (codegen, page cache, broadcast build)
    fn(spark, out).write.mode("overwrite")
      .format("noop").save()
    val times = (1 to iters).map { i =>
      // alternate AQE on/off across iterations: if the spread tracks
      // the toggle, runtime re-planning (coalesce/skew decisions) is
      // the variance source; if both arms swing alike, it is not
      val aqe = sys.env.get("SPARK_GRAFT_VP_AQE") match {
        case Some(v) => v.toBoolean
        case None => i % 2 == 1
      }
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      // second axis: AQE on, partition COALESCING toggled — isolates
      // the coalesce decisions from the skew-join half
      if (sys.env.contains("SPARK_GRAFT_VP_COALESCE")) {
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
          (i % 2 == 1).toString)
      }
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      fn(spark, out).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      val dg = (gcMillis() - g0) / 1e3
      println(f"[varprobe] iter $i (aqe=$aqe): $dt%.2f s " +
        f"(gc $dg%.2f s, load ${loadavg()}%.2f)")
      dt
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val sorted = times.sorted
    println(f"[varprobe] min ${sorted.head}%.2f  median ${sorted(iters / 2)}%.2f" +
      f"  max ${sorted.last}%.2f  spread ${(sorted.last - sorted.head) / sorted.head * 100}%.0f%%")
    if (sys.env.contains("SPARK_GRAFT_VP_PLAN")) {
      // materialize once under each AQE setting and print the FINAL
      // adaptive plan's exchange/partition decisions
      for (aqe <- Seq(true, false)) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        val df = fn(spark, out)
        df.write.mode("overwrite").format("noop").save()
        val plan = df.queryExecution.executedPlan.toString
        val lines = plan.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("AQEShuffleRead") ||
            l.contains("Join") || l.contains("skew")).take(24)
        println(s"[varprobe] === final plan aqe=$aqe ===")
        lines.foreach(l => println(s"[varprobe] ${l.trim.take(150)}"))
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    spark.stop()
  }
}
