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
}
