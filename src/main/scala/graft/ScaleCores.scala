package graft

import org.apache.spark.sql.SparkSession

/** r17 (r16-verdict item 8): make the core-count scaling check
  * informative. At sf0.1 — and still at the bench's 5× replication —
  * every entry is fixed-overhead-dominated, so 8-core and 32-core
  * wall times read ≈equal (r16: median ratio 0.92; r17: 0.94). This
  * main builds a LARGER key-shifted replication (default 25×, same
  * `ScaleProbe.build` the bench uses) and times the named queries at
  * the current `SPARK_GRAFT_CPUS`, so one 32-core and one 8-core
  * invocation give a comparison where compute actually dominates.
  *
  * Usage: SPARK_GRAFT_CPUS=8 runMain graft.ScaleCores [mult] [query...]
  */
object ScaleCores {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(25)
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("ml_dedup_minhash", "ml_substring_dedup", "ml_line_dedup",
        "ml_segment_dedup", "ds_wide_resale", "cb_q29")
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = s"target/scale/${new java.io.File(src).getName}_x$mult"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$out/lineitem.parquet").exists())
      ScaleProbe.build(spark, src, out, mult)
    for (n <- names) {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, out)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sc] cpus=$cpus mult=$mult $n best=${ts.min}%.3f " +
        s"all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
