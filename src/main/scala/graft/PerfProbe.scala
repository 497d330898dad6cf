package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc overhead probe: separates fixed job overhead from per-query
  * compute so perf work targets the real bottleneck. Currently aimed at
  * the LSH dedup pipelines (the two heaviest bench entries). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { n => Tables.load(spark, sfDir, n).persist().count() }

    def best(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] $name: $t%.3f")
    }

    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sfDir, "embeddings")
    val corpus = graft.queries.MlQueries.plantedDupCorpus(emb)

    // stage anatomy of nearDupPairsLsh (re-derived; no checkpoints here
    // so each probe shows cumulative lazy compute)
    val prepared = corpus.select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x)))
    best("lsh_1_prepare")(prepared)
    best("lsh_2_sigs")(prepared
      .select(col("id"), posexplode(expr("graft_band_sigs(v, 128, 16)")))
      .toDF("id", "band", "sig"))
    val banded = prepared
      .select(col("id"), posexplode(expr("graft_band_sigs(v, 128, 16)")))
      .toDF("id", "band", "sig").localCheckpoint()
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    best("lsh_3_cand")(cand)
    println(s"[probe] lsh candidate pairs: ${cand.count()}")
    best("lsh_full")(ops.VectorSearch.nearDupPairsLsh(corpus, 0.9))
    best("minhash_full")(
      SparkEntry.queries("ml_dedup_minhash")(spark, sfDir))
    best("q21_full")(SparkEntry.queries("q21_waiting_supplier")(spark, sfDir))

    // ---- TPC-H creep attribution (round-6 verdict item 4) -------------
    // Splits each creeping query into analyze (DataFrame construction
    // forces analysis), optimize+compile (executedPlan), and execute
    // (noop write on the prepared df). If the first two are small, the
    // injected rules / 1055-name registry are exonerated and the wall
    // creep is execution-side (machine noise / codegen warmup).
    // Measured r7 (quiet machine, sf0.1, best-of-3):
    //   q1  analyze=0.027 optimize=0.012 execute=0.372
    //   q3  analyze=0.023 optimize=0.018 execute=0.366
    //   q18 analyze=0.015 optimize=0.014 execute=0.326
    //   q21 analyze=0.038 optimize=0.024 execute=0.411
    // Plan building is <= 0.06 s/query (~10%): the injected rules and
    // the 1055-name registry are NOT the r4->r6 wall-creep source; the
    // drift tracks execution-side machine noise.
    def phases(name: String): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val bAn = runs.map(_._1).min
      val bOpt = runs.map(_._2).min
      val bEx = runs.map(_._3).min
      println(f"[probe] $name phases: analyze=$bAn%.3f optimize=$bOpt%.3f execute=$bEx%.3f")
    }
    Seq("q1_pricing_summary", "q3_shipping_priority",
      "q18_large_orders", "q21_waiting_supplier").foreach(phases)
    spark.stop()
  }
}
