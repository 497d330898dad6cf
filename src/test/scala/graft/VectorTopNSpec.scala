package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.VectorIndexes

/** Vector top-n pushdown (plans/VectorTopN.scala): the opt-in rewrite
  * of ORDER BY graft_l2sq(col, const) LIMIT k into a cell-pruned index
  * scan must (a) fire on the canonical shapes, (b) actually prune cells
  * on clustered data, and (c) NEVER change the values — the pruning is
  * exact by the triangle-inequality bound, and these tests pin that
  * claim against brute force. */
class VectorTopNSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 8
  private val root = "target/tmp/vectopn"

  /** 8 well-separated clusters x 30 members: center c = 10c on axis
    * (c mod dim), members jittered deterministically by +-0.2. */
  private lazy val corpusDir: String = {
    val rows = for {
      c <- 0 until 8
      m <- 0 until 30
    } yield {
      val id = (c * 30 + m).toLong
      val emb = Array.tabulate(dim) { j =>
        val base = if (j == c % dim) 10.0 * (c + 1) else 0.0
        (base + ((id * 31 + j * 7) % 5 - 2) / 10.0).toFloat
      }
      (id, emb.toSeq, c)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    df.write.mode("overwrite").parquet(s"$root/clustered.parquet")
    root
  }

  private def qSql(target: Int): String = {
    val q = Array.tabulate(dim) { j =>
      if (j == target % dim) 10.0 * (target + 1) else 0.0
    }
    q.mkString("array(", "D, ", "D)")
  }

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.vectorTopN.enabled", "true")
    try f finally spark.conf.set("spark.graft.vectorTopN.enabled", "false")
  }

  private def base: DataFrame = spark.read.parquet(s"$corpusDir/clustered.parquet")

  private def idx() = VectorIndexes.create(spark, "vt_spec", corpusDir, "clustered",
    idCol = "vec_id", vecCol = "embedding", nCells = 8)

  test("fires, prunes most cells, and matches brute force exactly") {
    val d = idx()
    def q = base.orderBy(expr(s"graft_l2sq(embedding, ${qSql(2)})"), col("vec_id"))
      .limit(5).select(col("vec_id"), col("label"))
    val brute = q.collect().toSeq
    val (plan, pruned) = withRule { (q.queryExecution.optimizedPlan.toString, q.collect().toSeq) }
    assert(plan.contains("cid#"), s"did not fire:\n$plan")
    assert(pruned == brute)
    // driver-side bound on clustered data: the far clusters are pruned
    val qv = Array.tabulate(dim)(j => if (j == 2 % dim) 30.0 else 0.0)
    val cells = VectorIndexes.prunedCells(d, qv, 5).get
    assert(cells.size < 8, s"no pruning on well-separated clusters: $cells")
    VectorIndexes.drop("vt_spec")
  }

  test("cell filter reaches the file scan as a partition filter") {
    idx()
    def q = base.orderBy(expr(s"graft_l2sq(embedding, ${qSql(2)})"), col("vec_id"))
      .limit(5).select(col("vec_id"))
    val physical = withRule { q.queryExecution.executedPlan.toString }
    // cid is the index's partition column: the cell subset must show up
    // as PartitionFilters on the parquet scan (directories skipped on
    // disk), not as a post-scan Filter
    assert(physical.contains("PartitionFilters: [cid"),
      s"cell filter did not become a partition filter:\n$physical")
    VectorIndexes.drop("vt_spec")
  }

  test("resolves the sort key through a projected alias") {
    idx()
    def q = base
      .select(col("vec_id"), col("embedding"),
        expr(s"graft_l2sq(embedding, ${qSql(5)})").as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(3)
      .select(col("vec_id"), round(sqrt(col("d2")), 6).as("dist"))
    val brute = q.collect().toSeq
    val (plan, pruned) = withRule { (q.queryExecution.optimizedPlan.toString, q.collect().toSeq) }
    assert(plan.contains("cid#"), s"did not fire through the alias:\n$plan")
    assert(pruned == brute)
    VectorIndexes.drop("vt_spec")
  }

  test("does not fire through a filter (count bound would be unsound)") {
    idx()
    def q = base.where(col("label") =!= 3)
      .orderBy(expr(s"graft_l2sq(embedding, ${qSql(2)})"), col("vec_id"))
      .limit(5).select(col("vec_id"))
    val brute = q.collect().toSeq
    val (plan, res) = withRule { (q.queryExecution.optimizedPlan.toString, q.collect().toSeq) }
    assert(!plan.contains("cid#"), s"fired through a filter:\n$plan")
    assert(res == brute)
    VectorIndexes.drop("vt_spec")
  }

  test("does not fire when k exceeds the indexed row count") {
    idx()
    def q = base.orderBy(expr(s"graft_l2sq(embedding, ${qSql(0)})"), col("vec_id"))
      .limit(1000).select(col("vec_id"))
    val (plan, n) = withRule { (q.queryExecution.optimizedPlan.toString, q.count()) }
    assert(!plan.contains("cid#"), s"fired with k > N:\n$plan")
    assert(n == 240)
    VectorIndexes.drop("vt_spec")
  }

  test("descending order is left alone") {
    idx()
    def q = base.orderBy(expr(s"graft_l2sq(embedding, ${qSql(2)})").desc)
      .limit(5).select(col("vec_id"))
    val plan = withRule { q.queryExecution.optimizedPlan.toString }
    assert(!plan.contains("cid#"), s"fired on DESC:\n$plan")
    VectorIndexes.drop("vt_spec")
  }

  test("fires from SQL text through the injected function registry") {
    idx()
    base.createOrReplaceTempView("vt_clustered")
    def q = spark.sql(
      s"""SELECT vec_id FROM vt_clustered
          ORDER BY graft_l2sq(embedding, ${qSql(4)}), vec_id LIMIT 5""")
    val brute = q.collect().toSeq
    val (plan, res) = withRule { (q.queryExecution.optimizedPlan.toString, q.collect().toSeq) }
    assert(plan.contains("cid#"), s"did not fire from SQL:\n$plan")
    assert(res == brute)
    VectorIndexes.drop("vt_spec")
  }

  test("exactness at the cell boundary: every query point agrees with brute force") {
    val d = idx()
    withRule {
      for (c <- 0 until 8) {
        def q = base.orderBy(expr(s"graft_l2sq(embedding, ${qSql(c)})"), col("vec_id"))
          .limit(7).select(col("vec_id"))
        val withIdx = q.collect().toSeq
        spark.conf.set("spark.graft.vectorTopN.enabled", "false")
        val brute = q.collect().toSeq
        spark.conf.set("spark.graft.vectorTopN.enabled", "true")
        assert(withIdx == brute, s"divergence at query cluster $c")
      }
    }
    assert(d.stats.map(_.cnt).sum == 240)
    VectorIndexes.drop("vt_spec")
  }
}
