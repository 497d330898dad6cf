package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the round-7 operators, checked
  * independently of the DuckDB oracle (which pins exact values — these
  * pin the LAWS the values must obey, so a future fixture regeneration
  * cannot silently accept a wrong-but-matching pair). */
class Round7InvariantSpec extends AnyFunSuite {
  import TestSpark._

  test("kmeans: Lloyd iterations never increase total within-cluster distance") {
    val emb = Tables.load(spark, sf, "embeddings")
    def totalDist(iters: Int): Double =
      graft.ops.VectorSearch.kmeansAssign(emb, 8, iters)
        .agg(sum(col("dist"))).head.getDouble(0)
    val d1 = totalDist(1)
    val d2 = totalDist(2)
    assert(d2 <= d1 + 1e-6, s"Lloyd step increased cost: $d1 -> $d2")
    // and assignments are deterministic across runs
    val a = graft.ops.VectorSearch.kmeansAssign(emb, 8, 2).collect().toSeq
    val b = graft.ops.VectorSearch.kmeansAssign(emb, 8, 2).collect().toSeq
    assert(a == b, "kmeans is not run-deterministic")
  }

  test("segment dedup conserves segments: sum(n_kept) == global distinct segment count") {
    val out = SparkEntry.queries("ml_segment_dedup")(spark, sf)
    val kept = out.agg(sum(col("n_kept"))).head.getLong(0)
    val distinctSegs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("parts"))
      .select(explode(sequence(lit(0),
        (ceil(size(col("parts")) / 10.0) - 1).cast("int"))).as("seg"), col("parts"))
      .select(concat_ws(" ", slice(col("parts"), col("seg") * 10 + 1, lit(10))).as("t"))
      .distinct().count()
    assert(kept == distinctSegs,
      s"kept $kept segments but corpus has $distinctSegs distinct ones")
  }

  test("sessionize: no intra-session gap exceeds the threshold and session " +
      "starts are separated by more than it") {
    val out = SparkEntry.queries("fq_sessionize")(spark, sf)
    // dur_us of an n-event session is at most (n-1) * threshold
    val bad = out.filter(col("dur_us") > (col("n_events") - 1) * lit(86400L * 1000000L))
      .count()
    assert(bad == 0, s"$bad sessions with an impossible duration")
    // consecutive sessions of one user start more than the threshold
    // after the previous session's last event
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_id"))
    val overlap = out
      .withColumn("prev_end", lag(col("start_us") + col("dur_us"), 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start_us") - col("prev_end") <= lit(86400L * 1000000L))
      .count()
    assert(overlap == 0, s"$overlap session boundaries violate the gap threshold")
  }

  test("PQ paths keep a recall floor vs exact L2 top-10") {
    // Measured: sf0.01 pq/ivfpq/ivfpq_res = 0.36/0.36/0.32; sf0.001
    // (this suite's fixture) dips to 0.12 on ivfpq_res — the synthetic
    // near-uniform embeddings are PQ's hardest case (residual coding
    // only pays off on clustered data) and nprobe=3 of 8 cells caps
    // IVF recall. The 0.08 floor detects catastrophic breakage (a
    // broken codebook or distance table collapses recall toward
    // k/N ≈ 0.02), not tuning.
    import graft.ops.VectorSearch
    val emb = Tables.load(spark, sf, "embeddings")
    val prep = emb.select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("v"))
    val q = prep.filter(col("id") < 5)
      .select(col("id").as("q_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d").asc, col("id").asc)
    val exact = q.crossJoin(prep).filter(col("id") =!= col("q_id"))
      .withColumn("d", expr(
        "graft_dot(qv, qv) - 2*graft_dot(qv, v) + graft_dot(v, v)"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("q_id"), col("id").as("vec_id"))
    val exactSet = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(out: org.apache.spark.sql.DataFrame): Double =
      out.select(col("q_id"), col("vec_id")).collect()
        .count(r => exactSet.contains((r.getLong(0), r.getLong(1)))) / 50.0
    val qs = emb.filter(col("vec_id") < 5)
    val rPq = recall(VectorSearch.pqTopK(emb, qs, 8, 8, 16, 10))
    val rIvf = recall(VectorSearch.topKIvfPq(emb, qs, 8, 3, 8, 8, 16, 10))
    val rRes = recall(VectorSearch.topKIvfPqResidual(emb, qs, 8, 3, 8, 8, 16, 10))
    assert(rPq >= 0.08, s"pq recall collapsed: $rPq")
    assert(rIvf >= 0.08, s"ivfpq recall collapsed: $rIvf")
    assert(rRes >= 0.08, s"ivfpq_res recall collapsed: $rRes")
  }

  test("PQ top-k lists are valid: k rows per query, dense ranks, non-decreasing distance") {
    for (q <- Seq("ml_ann_pq", "ml_ann_ivfpq")) {
      val out = SparkEntry.queries(q)(spark, sf)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("rn"))
      val viol = out
        .withColumn("prev", lag(col("adist"), 1).over(w))
        .filter(col("adist") < 0 ||
          (col("prev").isNotNull && col("adist") < col("prev") - 1e-9))
        .count()
      assert(viol == 0, s"$q: $viol ordering/negativity violations")
      val counts = out.groupBy(col("q_id")).agg(count(lit(1)).as("n"),
        max(col("rn")).as("mx")).filter(col("n") =!= col("mx")).count()
      assert(counts == 0, s"$q: ranks are not dense")
    }
  }
}
