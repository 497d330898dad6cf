package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The facade is the user-facing contract — exercise each entry point
  * through the public surface. */
class GraftFacadeSpec extends AnyFunSuite {
  import TestSpark._

  test("facade: sql functions + models + ops reachable") {
    Graft.install(spark)
    Graft.registerTables(spark, sf)
    assert(spark.sql(
      "SELECT bitmap_count(bitmap_agg(c_custkey)) AS n FROM customer")
      .head().getLong(0) > 0)

    val docs = Tables.load(spark, sf, "documents")
    assert(Graft.minhashDedup(docs, "doc_id", "text").columns
      .sameElements(Array("id_a", "id_b", "jaccard")))

    val emb = Tables.load(spark, sf, "embeddings")
    assert(Graft.annTopK(emb, emb.filter(col("vec_id") < 2), 3).count() == 6)

    val rec = Graft.recursive(
      spark.range(1, 2).select(col("id").cast("int").as("n")),
      d => d.select((col("n") * 2).as("n")).filter(col("n") <= 16))
    assert(rec.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 4, 8, 16)))

    assert(docs.select(Graft.qualityScore(col("text"))).count() > 0)
  }

  test("facade: IVF search, batch decode, named datetime/HOF functions") {
    Graft.install(spark)
    Graft.registerTables(spark, sf)
    val emb = Tables.load(spark, sf, "embeddings")
    val ivf = Graft.annTopKIvf(emb, emb.filter(col("vec_id") < 2),
      emb.filter(col("vec_id") < 8), nprobe = 2, k = 3)
    assert(ivf.columns.sameElements(Array("q_id", "rn", "vec_id", "sim")))
    assert(ivf.groupBy("q_id").count().collect().forall(_.getLong(1) <= 3))

    val docs = Tables.load(spark, sf, "documents").limit(5)
      .withColumn("blob", graft.ops.MultimodalOps.makeBlob(lit("IMG0"), col("text")))
    val dec = graft.ops.MultimodalOps.decodeBatch(docs, "doc_id", "blob")
    assert(dec.columns.sameElements(Array("doc_id", "format", "width", "height", "n_bytes")))
    assert(dec.count() == 5)

    assert(spark.sql(
      "SELECT unix_micros(hour_ceil(TIMESTAMP '2026-08-12 09:05:03')) AS hc").head().getLong(0)
      % 3600000000L == 0L)
    assert(spark.sql(
      "SELECT array_exists(array(1, 2, 3), x -> x = 2) AS e").head().getBoolean(0))
  }
}
