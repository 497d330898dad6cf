package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Similarity search over embedding columns (SURVEY.md §7.3 step 8;
  * reference ANN analog: be/src/storage/index/ann/faiss_ann_index.h —
  * replaced here by Spark-native search paths).
  *
  * Scale design: the query set is small and gets broadcast; the corpus
  * scan is a single pass (no shuffle) with the distance expression in
  * codegen; per-query top-k happens via window rank over the
  * (queries x corpus) join — at 1000 executors this is a map-side
  * broadcast-join + local top-k + one small shuffle on query id.
  * The LSH variant buckets the corpus once (hyperplane signs) and
  * probes only matching buckets — the 100 TB path when |queries| is
  * large.
  */
object VectorSearch {

  private def dvec(c: Column): Column = transform(c, _.cast("double"))

  /** Exact brute-force cosine top-k for each query vector. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = broadcast(
        queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
      .crossJoin(corpus)
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosineSimilarity(dvec(col("q_emb")), dvec(col("embedding"))), 6).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
  }

  /** Exact near-duplicate pairs by cosine similarity >= threshold.
    * Brute force (the correctness baseline; LSH below is the scale path). */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    // Precompute per-vector double casts + norms ONCE (checkpointed so
    // the pair join reads data, not expressions): the naive per-pair
    // cosine recomputes both norms and casts for every one of the
    // O(N^2) pairs — profiled 51s -> ~5s at sf0.1. dot/(na*nb) is the
    // identical arithmetic sequence, so results stay bit-for-bit.
    val prepared = corpus
      .select(col("vec_id").as("id"), dvec(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0.0), (acc, x) => acc + x)))
      .localCheckpoint()
    val a = prepared.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = prepared.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
                        lit(0.0), (acc, x) => acc + x)
          / (col("na") * col("nb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Random-hyperplane LSH bucketing: nPlanes pseudo-random (seeded,
    * deterministic) hyperplanes; bucket = sign-bit signature. Probing
    * joins on bucket equality — approximate, corpus scanned once. */
  def lshBuckets(df: DataFrame, dim: Int, nPlanes: Int = 8): DataFrame = {
    // plane p component j = hash(p, j) mapped to [-1, 1] — deterministic
    val sig = expr(
      s"""aggregate(sequence(0, ${nPlanes - 1}), CAST(0 AS BIGINT), (acc, p) ->
            acc + IF(aggregate(sequence(0, ${dim - 1}), CAST(0 AS DOUBLE), (s, j) ->
                       s + CAST(embedding[j] AS DOUBLE) *
                           (CAST(pmod(xxhash64(concat(CAST(p AS STRING), ':', CAST(j AS STRING))), 2000) AS DOUBLE) / 1000.0 - 1.0)
                     ) > 0,
                     shiftleft(CAST(1 AS BIGINT), p), CAST(0 AS BIGINT)))""")
    df.withColumn("bucket", sig)
  }

  /** IVF-style two-level search: assign every corpus vector to its best
    * centroid cell (one broadcast of the centroid set + one corpus
    * pass), then probe each query's `nprobe` best cells and rank
    * exactly inside them. At scale: centroids are small (broadcast),
    * the assignment is a map-side pass, and probing touches
    * ~nprobe/|cells| of the corpus — the faiss IVF contract. */
  def topKIvf(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              nprobe: Int, k: Int): DataFrame = {
    val cent = broadcast(centroids
      .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    def sim(a: Column, b: Column): Column =
      round(VectorFunctions.cosineSimilarity(dvec(a), dvec(b)), 6)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
    val assign = corpus.crossJoin(cent)
      .withColumn("csim", sim(col("embedding"), col("cemb")))
      .withColumn("crn", row_number().over(wAssign)).filter(col("crn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
    val wProbe = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("cid"))
    val qcells = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(cent)
      .withColumn("csim", sim(col("q_emb"), col("cemb")))
      .withColumn("crn", row_number().over(wProbe)).filter(col("crn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cid"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    qcells.join(assign, "cid")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), sim(col("q_emb"), col("embedding")).as("sim"))
      .withColumn("rn", row_number().over(wRank)).filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
  }

  /** Approximate top-k: probe only the query's LSH bucket. */
  def topKLsh(corpus: DataFrame, queries: DataFrame, dim: Int, k: Int): DataFrame = {
    val bc = lshBuckets(corpus, dim)
    val bq = lshBuckets(queries, dim)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    bq.join(bc, "bucket")
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorFunctions.cosineSimilarity(dvec(col("q_emb")), dvec(col("embedding"))), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("q_id"), col("rn"), col("vec_id"), col("sim"))
  }
}
