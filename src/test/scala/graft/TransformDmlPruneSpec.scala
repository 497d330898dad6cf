package graft

import org.scalatest.funsuite.AnyFunSuite

/** plans/LakehouseSql.scala DML target pruning on TRANSFORMED specs
  * beyond iceberg — the r14 "known remaining": delta/hudi/paimon DML
  * against a days(ts) table planned ALL files (correct, unpruned).
  * Delta stores the transformed partition value in its add entries, so
  * the same stored-value predicate the read path resolves now reaches
  * the writer's partFilter too. Pinned by MEASURING task input bytes
  * around the statement — at 100 TB a partition-scoped UPDATE that
  * scans the whole table is the difference between one partition's
  * files and ten thousand. */
class TransformDmlPruneSpec extends AnyFunSuite {
  import TestSpark._

  private def sql(s: String) = spark.sql(s)

  /** Task-level input RECORDS during `body` (bytesRead under-reports
    * on these local scans — records track the scanned row volume
    * exactly, which is what pruning bounds). */
  private def measuredInputRecords(body: => Unit): Long = {
    val recs = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          recs.addAndGet(te.taskMetrics.inputMetrics.recordsRead): Unit
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      org.apache.spark.sql.graftshim.ListenerShim.flush(spark.sparkContext): Unit
    } finally spark.sparkContext.removeSparkListener(listener)
    recs.get()
  }

  test("delta days(ts) UPDATE/DELETE scan only the conjunct's partitions") {
    // 20 daily partitions × 5k rows
    val total = 100000L
    spark.range(0, total)
      .selectExpr("id AS k",
        "timestamp(date_add(date'2024-01-01', CAST(id % 20 AS INT))) AS ts",
        "CAST(id AS INT) AS v",
        "repeat(sha2(CAST(id AS STRING), 256), 2) AS pad")
      .createOrReplaceTempView("tdp_src")
    sql("CREATE OR REPLACE TABLE graft_delta.tdp " +
      "PARTITIONED BY (days(ts)) AS SELECT * FROM tdp_src")
    // UPDATE scoped to 2 of 20 days: the probe read AND the writer's
    // matcher scan both carry the stored-value prune. Unpruned, the
    // matcher scan alone reads `total` records and the replacement-row
    // recompute another `total` (≥2× measured); pruned, both touch a
    // handful of partitions (measured ≈0.7× with probe overhead).
    val updRecords = measuredInputRecords {
      sql("UPDATE graft_delta.tdp SET v = v + 1000000 " +
        "WHERE ts >= '2024-01-03 00:00:00' AND ts < '2024-01-05 00:00:00'")
        .collect(): Unit
    }
    assert(updRecords < total,
      s"transformed UPDATE must prune its scans: read $updRecords of " +
        s"a $total-row table (unpruned ≥ 2×)")
    assert(updRecords > total / 5,
      s"the metric must bite (the pruned partitions' rows): $updRecords")
    assert(sql("SELECT count(*) AS n FROM graft_delta.tdp WHERE v >= 1000000")
      .head().getLong(0) == 10000L, "the update landed value-exact")
    // DELETE scoped to 1 day
    val delRecords = measuredInputRecords {
      sql("DELETE FROM graft_delta.tdp " +
        "WHERE ts >= '2024-01-10 00:00:00' AND ts < '2024-01-11 00:00:00'")
        .collect(): Unit
    }
    assert(delRecords < total * 60 / 100,
      s"transformed DELETE must prune its scans: read $delRecords of $total")
    assert(delRecords > total / 20,
      s"the metric must bite: $delRecords")
    assert(sql("SELECT count(*) AS n FROM graft_delta.tdp")
      .head().getLong(0) == 95000L, "the delete landed value-exact")
  }
}
