package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.VectorIndexes
import Q.t

/** Round-7 batch 2 — vector/text top-n pushdown demonstrations and
  * training-pipeline corpus ops. Every key oracle-exact vs DuckDB.
  *
  * opt_vector_topn: `ORDER BY graft_l2sq(embedding, const) LIMIT k`
  * over a vector-indexed table, rewritten by VectorTopNRule into an
  * EXACT triangle-inequality-pruned cell scan (reference:
  * PushDownVectorTopNIntoOlapScan.java). The oracle computes the same
  * top-k by brute force — exactness of the pruning is precisely what
  * the hash match certifies.
  */
object Round7bQueries {

  /** Fixed 64-dim query point, interpolated VERBATIM into both the
    * engine expression and the oracle SQL (shared-constant discipline,
    * same as the PII regex patterns). */
  val QVec: Seq[Double] = Vector.tabulate(64)(i => ((i % 7) - 3) / 20.0)

  private def qArrSql: String = QVec.mkString("array(", "D, ", "D)")
  private def qListSql: String = QVec.mkString("[", ", ", "]::DOUBLE[]")
  /** dot(q, q), precomputed driver-side (same left-to-right order). */
  private def qq: Double = QVec.foldLeft(0.0)((a, x) => a + x * x)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "opt_vector_topn" -> ((s, dir) => {
      val basePath = VectorIndexes.normalize(s"$dir/embeddings.parquet")
      val name = s"vt_${Integer.toHexString(basePath.hashCode)}"
      VectorIndexes.create(s, name, dir, "embeddings",
        idCol = "vec_id", vecCol = "embedding", nCells = 16)
      val emb = t(s, dir, "embeddings")
      // sort key: the raw squared-distance marker the rule matches on.
      // output dist: the EXPANSION dot(e,e) - 2*dot(e,q) + dot(q,q) in
      // left-to-right graft_dot order — bit-identical to the oracle's
      // list_inner_product spelling (direct vs expansion differ at
      // ~1e-12; round(,6) must see the same double on both engines).
      val de = "transform(embedding, x -> cast(x as double))"
      val df = emb
        .orderBy(expr(s"graft_l2sq(embedding, $qArrSql)"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"),
          round(sqrt(expr(s"graft_dot($de, $de) - 2 * graft_dot($de, $qArrSql) + ${qq}D")), 6)
            .as("dist"))
      s.conf.set("spark.graft.vectorTopN.enabled", "true")
      try {
        val optimized = df.queryExecution.optimizedPlan.toString
        require(optimized.contains("cid#"),
          s"vector top-n was not pushed into the index scan:\n$optimized")
        val rows = df.collect() // executes the cell-pruned plan
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      } finally s.conf.set("spark.graft.vectorTopN.enabled", "false")
    })
  )

  def oracle: Map[String, String] = Map(

    "opt_vector_topn" -> s"""
      SELECT vec_id,
             round(sqrt(list_inner_product(e, e) - 2 * list_inner_product(e, $qListSql)
                        + ${qq}), 6) AS dist
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
      ORDER BY (list_inner_product(e, e) - 2 * list_inner_product(e, $qListSql)) ASC,
               vec_id
      LIMIT 10"""
  )
}
