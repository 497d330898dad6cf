package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r16 diagnostic: per-stage timing + volumes of the 5x minhash entry. */
object MinhashProbe {
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
      println(f"[mp] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rnd <- 1 to 2) {
      println(s"[mp] ---- round $rnd ----")
      val docs = Tables.load(spark, dir, "documents")
      val base = docs
        .select(col("doc_id").as("id"), split(col("text"), " ").as("ws"))
        .withColumn("sh", graft.ops.Dedup.shingles(col("ws"), 3))
      val hashed = time("hashed checkpoint") {
        base.select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hsh"))
          .localCheckpoint()
      }
      val buckets = time("banding + buckets checkpoint") {
        hashed
          .select(col("id"), posexplode(expr("graft_minhash_bands(hsh, 16, 4)")))
          .toDF("id", "band", "sig")
          .groupBy(col("band"), col("sig"))
          .agg(sort_array(collect_list(col("id"))).as("ids"))
          .filter(size(col("ids")) >= 2)
          .localCheckpoint()
      }
      val st = buckets.agg(count(lit(1)).as("b"),
        sum(size(col("ids"))).as("m"), max(size(col("ids"))).as("mx")).head()
      println(s"[mp] buckets: ${st.getLong(0)}, members: ${st.getLong(1)}, max: ${st.getInt(2)}")
      val cand = buckets.select(explode(expr(
          """flatten(transform(sequence(1, size(ids) - 1),
            |  i -> transform(slice(ids, i + 1, size(ids) - i),
            |    b -> struct(element_at(ids, i) AS id_a, b AS id_b))))"""
            .stripMargin)).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      time("pair explode (no distinct)") { noop(cand) }
      println(s"[mp] raw pairs: ${cand.count()}")
      val candD = cand.distinct()
      time("+ distinct") { noop(candD) }
      println(s"[mp] distinct pairs: ${candD.count()}")
      val sets = hashed
      val inter = size(array_intersect(col("sa"), col("sb")))
      val ver = candD
        .join(sets.select(col("id").as("id_a"), col("hsh").as("sa")), "id_a")
        .join(sets.select(col("id").as("id_b"), col("hsh").as("sb")), "id_b")
        .withColumn("jaccard",
          inter.cast("double") / (size(col("sa")) + size(col("sb")) - inter))
        .filter(col("jaccard") >= 0.5)
      time("A verify joins + array_intersect") { noop(ver) }
      println(s"[mp] output pairs: ${ver.count()}")
      // B: sorted checkpoint + merge-walk intersect kernel
      val hashedS = time("B sorted-hashed checkpoint") {
        base.select(col("id"),
            expr("graft_sort_longs(transform(sh, s -> xxhash64(s)))").as("hsh"))
          .localCheckpoint()
      }
      val interS = expr("graft_inter_sorted(sa, sb)")
      val verS = candD
        .join(hashedS.select(col("id").as("id_a"), col("hsh").as("sa")), "id_a")
        .join(hashedS.select(col("id").as("id_b"), col("hsh").as("sb")), "id_b")
        .withColumn("jaccard",
          interS.cast("double") / (size(col("sa")) + size(col("sb")) - interS))
        .filter(col("jaccard") >= 0.5)
      time("B verify joins + inter_sorted") { noop(verS) }
      println(s"[mp] B output pairs: ${verS.count()}")
      time("full entry (ordered)") {
        noop(graft.ops.Dedup.minhashPairs(docs, "doc_id", "text", 3, 0.5)
          .orderBy(col("id_a"), col("id_b")))
      }
    }
    spark.stop()
  }
}
