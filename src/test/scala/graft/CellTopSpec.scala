package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CellTop

/** Pins the CellTop / PqCodes kernels (the r9 per-row argmin that
  * replaced crossJoin+window centroid assignment) against the exact
  * DataFrame spelling they replaced, on the real embeddings fixture —
  * every metric, multi-probe, and the cid tie-break. */
class CellTopSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val prep = {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.select(col("vec_id").as("id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .localCheckpoint()
  }

  private lazy val cents = prep.orderBy(col("id")).limit(8)
    .select(col("id"), col("v")).collect().toSeq
    .map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** The replaced spelling: crossJoin(cent) + row_number window. */
  private def viaWindow(metric: String, n: Int) = {
    val spark2 = spark
    import spark2.implicits._
    val centDf = cents.toDF("cid", "cv")
    val d = metric match {
      case "l2sq" =>
        expr("graft_dot(v, v) - 2 * graft_dot(v, cv) + graft_dot(cv, cv)")
      case "cos" =>
        expr("graft_dot(v, cv)") /
          (sqrt(expr("graft_dot(v, v)")) * sqrt(expr("graft_dot(cv, cv)")))
      case "cos6" =>
        round(expr("graft_dot(v, cv)") /
          (sqrt(expr("graft_dot(v, v)")) * sqrt(expr("graft_dot(cv, cv)"))), 6)
    }
    val ord = if (metric == "l2sq") col("d").asc else col("d").desc
    val w = Window.partitionBy(col("id")).orderBy(ord, col("cid").asc)
    prep.crossJoin(broadcast(centDf)).withColumn("d", d)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
      .select(col("id"), col("rn"), col("cid"), col("d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
  }

  private def viaKernel(metric: String, n: Int) =
    prep.select(col("id"),
        posexplode(CellTop.topLong(col("v"), cents, n, metric)).as(Seq("p", "c")))
      .select(col("id"), (col("p") + 1).as("rn"), col("c.cid"), col("c.d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet

  for (metric <- Seq("l2sq", "cos", "cos6"); n <- Seq(1, 3)) {
    test(s"CellTop == crossJoin+window spelling ($metric, top-$n)") {
      assert(viaKernel(metric, n) == viaWindow(metric, n))
    }
  }

  test("exact ties break on ascending cid (duplicated centroid)") {
    val spark2 = spark
    import spark2.implicits._
    // centroid 5 duplicates centroid 2's vector: distance ties exactly,
    // so every row assigned to it must report cid 2, never 5
    val dup = Seq((2L, Seq(1.0, 0.0)), (5L, Seq(1.0, 0.0)), (9L, Seq(0.0, 1.0)))
    val rows = Seq((100L, Seq(0.9, 0.1)), (101L, Seq(0.1, 0.9)))
      .toDF("id", "v")
    val got = rows.select(col("id"),
        CellTop.topLong(col("v"), dup, 1, "l2sq").getItem(0).getField("cid").as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(100L -> 2L, 101L -> 9L))
  }

  test("float storage path == pre-cast double path, bit for bit (r9)") {
    // the fixture embedding column is ARRAY<FLOAT>; the kernel widens
    // per element (exact), so feeding the raw storage column must give
    // the same cells and distances as casting first
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(v: org.apache.spark.sql.Column) = emb
      .select(col("vec_id"),
        posexplode(CellTop.topLong(v, cents, 3, "l2sq")).as(Seq("p", "c")))
      .select(col("vec_id"), col("p"), col("c.cid"), col("c.d"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(run(col("embedding")) ==
      run(transform(col("embedding"), _.cast("double"))))
  }

  test("SQL surface: graft_pq_codes matches per-sub argmin over slices") {
    // 4-dim vectors, 2 subspaces of dim 2, 2 codes per sub
    val books = Seq(
      Seq((0, Seq(0.0, 0.0)), (1, Seq(1.0, 1.0))),
      Seq((0, Seq(0.0, 1.0)), (1, Seq(1.0, 0.0))))
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, Seq(0.9, 0.9, 0.1, 0.9)), (2L, Seq(0.1, 0.0, 0.9, 0.1)))
      .toDF("id", "v")
    val got = df.select(col("id"), CellTop.pqCodes(col("v"), books).as("codes"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    assert(got == Map(1L -> Seq(1, 0), 2L -> Seq(0, 1)))
  }
}
