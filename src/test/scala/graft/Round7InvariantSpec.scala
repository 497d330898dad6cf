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
