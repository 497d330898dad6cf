package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Routine-load analog (reference:
  * fe/fe-core/.../load/routineload/RoutineLoadJob.java +
  * KafkaRoutineLoadJob): a consumer GROUP continuously drains a
  * partitioned source into a table, committing per-partition offsets
  * with every batch. Kafka is absent from the sandbox, so the source
  * is any DataFrame with a monotone offset column, sharded into
  * "topic partitions" by hash — the consumer-group mechanics
  * (partition assignment, per-partition offset progress, batch caps,
  * resumability from the committed log) are the thing being modeled.
  *
  * Scheduling mirrors the reference split: the DRIVER plays the FE
  * scheduler (tiny per-partition offset vectors, one collect of
  * nPartitions rows per batch — never data), executors play the BEs
  * (the filter/rank/append runs distributed). The offset log is itself
  * a table: one commit row per (batch, partition) holding consumer id
  * and the (from, to] offset range — the analog of the reference's
  * job progress persisted in the txn log.
  *
  * Delivery contract: offsets commit AFTER the batch append lands (the
  * reference commits offsets atomically with the load txn; a file sink
  * has no txn, so a crash between append and commit replays one batch
  * — at-least-once, documented).
  */
object RoutineLoad {

  /** one committed (batch, partition) offset range. */
  case class Commit(batch: Long, partition: Int, consumerId: Int,
                    fromOffset: Long, toOffset: Long, rows: Long)

  /** Drain `source` into `outDir` in capped batches until empty.
    * Returns the full commit log (also persisted to `logDir`). */
  def run(spark: SparkSession, source: DataFrame, offsetCol: String,
          nPartitions: Int, nConsumers: Int, maxBatchRows: Int,
          outDir: String, logDir: String): Seq[Commit] = {
    import spark.implicits._
    require(nPartitions > 0 && nConsumers > 0 && maxBatchRows > 0)
    // shard into topic partitions once; cache — every batch filters it
    val sharded = source
      .withColumn("__part", pmod(col(offsetCol), lit(nPartitions)).cast("int"))
      .localCheckpoint()
    // consumer-group assignment: round-robin partitions over consumers
    def consumerOf(p: Int): Int = p % nConsumers
    // RESUME from a previously persisted log: the job picks up at each
    // partition's last committed offset (RoutineLoadJob progress replay)
    val logPath = new org.apache.hadoop.fs.Path(logDir)
    val fs = logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val resumed: Map[Int, Long] =
      if (!fs.exists(logPath)) Map.empty
      else spark.read.parquet(logDir)
        .groupBy(col("partition")).agg(max(col("toOffset")).as("o"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var committed: Map[Int, Long] =
      (0 until nPartitions).map(p => p -> resumed.getOrElse(p, -1L)).toMap
    val log = Seq.newBuilder[Commit]
    var batch = 0L
    var drained = false
    while (!drained) {
      // pending rows beyond each partition's committed offset, capped
      // at maxBatchRows per partition (exec_mem/batch-rows cap analog)
      val offsets = committed.toSeq.toDF("__part", "__committed")
      val w = Window.partitionBy(col("__part")).orderBy(col(offsetCol))
      val batchRows = sharded
        .join(broadcast(offsets), "__part")
        .filter(col(offsetCol) > col("__committed"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= maxBatchRows)
        .drop("__rn", "__committed")
      val progress = batchRows.groupBy(col("__part"))
        .agg(max(col(offsetCol)).as("to"), count(lit(1)).as("n"))
        .collect() // nPartitions rows at most — scheduler-sized, not data
      if (progress.isEmpty) drained = true
      else {
        batchRows.withColumn("__batch", lit(batch))
          .write.mode(SaveMode.Append).parquet(outDir)
        val commits = progress.map { r =>
          val p = r.getInt(0)
          Commit(batch, p, consumerOf(p), committed(p), r.getLong(1), r.getLong(2))
        }.sortBy(_.partition).toSeq
        commits.foreach(c => committed += c.partition -> c.toOffset)
        spark.createDataset(commits).write.mode(SaveMode.Append).parquet(logDir)
        log ++= commits
        batch += 1
      }
    }
    log.result()
  }

  /** Offset-log invariants (asserted by the declared query and the
    * spec): ranges are per-partition contiguous — each commit starts
    * where the previous ended — rows add up to the source count, and
    * the final offset per partition is the partition's max. */
  def assertLogConsistent(log: Seq[Commit], sourceRows: Long,
                          maxOffsetByPart: Map[Int, Long]): Unit = {
    require(log.map(_.rows).sum == sourceRows,
      s"committed ${log.map(_.rows).sum} rows, source has $sourceRows")
    log.groupBy(_.partition).foreach { case (p, cs) =>
      val sorted = cs.sortBy(_.batch)
      sorted.sliding(2).foreach {
        case Seq(a, b) => require(b.fromOffset == a.toOffset,
          s"gap in partition $p: ${a.toOffset} -> ${b.fromOffset}")
        case _ =>
      }
      require(sorted.head.fromOffset == -1L, s"partition $p does not start at -1")
      require(sorted.last.toOffset == maxOffsetByPart(p),
        s"partition $p final offset ${sorted.last.toOffset} != max ${maxOffsetByPart(p)}")
      require(cs.map(_.consumerId).distinct.size == 1,
        s"partition $p moved between consumers mid-job")
    }
  }
}
