package graft

import org.apache.spark.sql.SparkSession

/** r17 stage-breakdown probe for ml_dedup_components (guide §1): times
  * the pair-graph build, the label-propagation rounds, and the full
  * query separately with the noop sink, so the candidate optimizations
  * (per-round join shape, fingerprint reuse) are judged against the
  * stage they actually touch. Set SPARK_GRAFT_CC_VERBOSE=1 to also get
  * per-round changed-counts/wall from Dedup.connectedComponents.
  *
  * Usage: runMain graft.ComponentsProbe [dir] [iters]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf0.1_x5")
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to iters).map { i =>
        val t0 = System.nanoTime()
        body
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[cc] $label iter$i: $t%.3f s")
        t
      }
      println(f"[cc] $label BEST: ${ts.min}%.3f s")
    }

    def pairs() = {
      graft.Tables.registerAll(spark, dir)
      spark.sql("""
        SELECT doc_id,
               md5(concat_ws(' ', slice(split(text, ' '), 1, 3))) AS k1,
               md5(concat_ws(' ', slice(split(text, ' '), 3, 3))) AS k2
        FROM documents WHERE size(split(text, ' ')) >= 5""")
        .createOrReplaceTempView("fp_probe")
      spark.sql("""
        SELECT a.doc_id AS ida, b.doc_id AS idb
        FROM fp_probe a JOIN fp_probe b ON a.k1 = b.k1 AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id
        FROM fp_probe a JOIN fp_probe b ON a.k2 = b.k2 AND a.doc_id < b.doc_id""")
    }

    time("pairs_build") {
      pairs().write.format("noop").mode("overwrite").save()
    }
    time("components") {
      graft.ops.Dedup.connectedComponents(pairs(), "ida", "idb")
        .write.format("noop").mode("overwrite").save()
    }
    time("full_query") {
      SparkEntry.queries("ml_dedup_components")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
