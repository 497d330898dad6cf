package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 diagnostic: A/B shapes for the 5x embedding LSH entry. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/sf0.1_x5")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[lp] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rnd <- 1 to 3) {
      println(s"[lp] ---- round $rnd ----")
      val emb = Tables.load(spark, dir, "embeddings")
      val corpus = graft.queries.MlQueries.plantedDupCorpus(emb)
      val prepared = corpus
        .select(col("vec_id").as("id"), col("embedding").as("v"))
        .withColumn("nrm", sqrt(expr("graft_dot(v, v)")))
        .localCheckpoint()
      def verify(cand: DataFrame): DataFrame = cand
        .join(prepared.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
        .join(prepared.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(expr("graft_dot(va, vb)") / (col("na") * col("nb")), 6).as("sim"))
        .filter(col("sim") >= 0.9)

      // A: bucket-explode, dedup AFTER verify
      time("A bucket-explode + verify + late distinct") {
        val buckets = prepared
          .select(col("id"), posexplode(expr(s"graft_band_sigs(v, 128, 16)")))
          .toDF("id", "band", "sig")
          .groupBy(col("band"), col("sig"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
          .localCheckpoint()
        graft.ops.Dedup.requireBoundedBucketLists(buckets, "ids", "lp", "(band, sig)")
        val cand = buckets.select(explode(expr(
            """flatten(transform(sequence(1, size(ids) - 1),
              |  i -> transform(slice(ids, i + 1, size(ids) - i),
              |    b -> struct(element_at(ids, i) AS id_a, b AS id_b))))"""
              .stripMargin)).as("p"))
          .select(col("p.id_a"), col("p.id_b"))
        noop(verify(cand).distinct().orderBy(col("id_a"), col("id_b")))
      }

      // B: banded self-join, dedup AFTER verify
      time("B self-join + verify + late distinct") {
        val banded = prepared
          .select(col("id"), posexplode(expr(s"graft_band_sigs(v, 128, 16)")))
          .toDF("id", "band", "sig")
          .localCheckpoint()
        graft.ops.Dedup.requireBoundedBuckets(banded, Seq("band", "sig"), "lp")
        val cand = banded.as("x")
          .join(banded.as("y"),
            col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
              col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        noop(verify(cand).distinct().orderBy(col("id_a"), col("id_b")))
      }

      // C: current committed shape (bucket-explode, distinct before verify)
      time("C bucket-explode + early distinct + verify") {
        noop(graft.ops.VectorSearch.nearDupPairsLsh(corpus, 0.9)
          .orderBy(col("id_a"), col("id_b")))
      }
    }
    spark.stop()
  }
}
