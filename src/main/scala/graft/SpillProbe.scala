package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Memory-pressure spill probe (reference envelope: grace hash join /
  * partitioned agg / spill sort —
  * be/src/pipeline/exec/partitioned_hash_join_sink_operator.h:103,
  * spill_sort_sink_operator.h:69). ScaleProbe proves plans hold on 5x
  * rows; THIS proves the spill paths engage gracefully: the heaviest
  * agg/join/sort queries re-run at the 5x replication under a
  * constrained execution-memory budget (spark.memory.fraction=0.02,
  * 2 shuffle partitions, broadcast joins disabled so the spill-capable
  * sort-merge/hash-agg/sort operators carry the work),
  * with a task-metrics listener asserting BOTH that the run actually
  * spilled (memory+disk spill bytes > 0 — otherwise the probe proved
  * nothing) and that every result is bit-identical to the same query
  * under a roomy session (correctness under pressure, the contract the
  * reference's spill operators guarantee).
  *
  * One command: `sbt "runMain graft.SpillProbe"`; exits non-zero on a
  * crash, a checksum mismatch, or a no-spill run.
  *
  * Measured 2026-08-14 (sf0.1 x5, local[4], 8G JVM, ~150 MB execution
  * pool): every query completes with checksums identical to the roomy
  * run; q21 (sort-merge join sorts) spilled 119 MB, the full-lineitem
  * sort 329 MB — total 448 MB through the spill paths. q1/q18/
  * wide_resale working sets still fit the per-task budget at this
  * scale (0 spill, correct results).
  */
object SpillProbe {

  private val names = Seq("q1_pricing_summary", "q18_large_orders",
    "q21_waiting_supplier", "ds_wide_resale")

  /** order-sensitive checksum of a (small, sorted) query result. */
  private def checksum(spark: SparkSession, name: String, dir: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    val rows = df.collect().map(_.toString).mkString("\n")
    java.security.MessageDigest.getInstance("MD5").digest(rows.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** the pure-sort pressure case: full-table global sort, no early agg
    * to shrink it — the spill-sort operator's worst input. */
  private def bigSort(spark: SparkSession, dir: String): Unit =
    Tables.load(spark, dir, "lineitem")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // phase 1: roomy session -> build the 5x fixture (pressure needs
    // working sets well past the constrained budget) + reference
    // checksums at 5x
    val s1 = GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")).getOrCreate()
    GraftSession.install(s1)
    s1.sparkContext.setLogLevel("WARN")
    val dir = s"target/scale/${new java.io.File(sfDir).getName}_x5"
    ScaleProbe.build(s1, sfDir, dir, 5)
    val expected = names.map(n => n -> checksum(s1, n, dir)).toMap
    s1.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // phase 2: constrained session — tiny execution-memory budget, no
    // broadcast joins (a broadcast build side cannot spill; the
    // spill-capable SMJ/hash-agg/sort operators must carry the work)
    val spilled = new AtomicLong(0)
    // 2 shuffle partitions concentrate each operator's data into few
    // fat tasks; fraction 0.02 of the 4G sbt heap leaves ~75 MB of
    // execution memory — far below the sort/agg working sets, so the
    // spill paths MUST engage for the run to complete
    val s2 = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.memory.fraction", "0.02")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")).getOrCreate()
    GraftSession.install(s2)
    s2.sparkContext.setLogLevel("WARN")
    println(s"[spill] constrained session: fraction=" +
      s2.sparkContext.getConf.get("spark.memory.fraction", "unset") +
      s" heapMB=${Runtime.getRuntime.maxMemory() / 1024 / 1024}" +
      s" parallelism=${s2.sparkContext.defaultParallelism}")
    s2.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled); () }
      }
    })

    var failures = List.empty[String]
    names.foreach { n =>
      val before = spilled.get()
      val got = try Some(checksum(s2, n, dir)) catch {
        case e: Throwable => failures ::= s"$n crashed under pressure: $e"; None
      }
      got.foreach { g =>
        if (g != expected(n)) failures ::= s"$n result changed under memory pressure"
      }
      println(f"[spill] $n: spilled ${(spilled.get() - before) / 1e6}%.1f MB, " +
        s"checksum ${if (got.contains(expected(n))) "ok" else "MISMATCH"}")
    }
    val beforeSort = spilled.get()
    try {
      bigSort(s2, dir)
      println(f"[spill] full_sort: spilled ${(spilled.get() - beforeSort) / 1e6}%.1f MB")
    } catch { case e: Throwable => failures ::= s"full_sort crashed: $e" }

    if (spilled.get() == 0)
      failures ::= "nothing spilled — the probe exerted no memory pressure"
    s2.stop()
    if (failures.nonEmpty) {
      failures.foreach(f => println(s"[spill] FAIL $f"))
      sys.exit(1)
    }
    println(f"[spill] PASS ${names.size} queries + full sort bit-identical " +
      f"under pressure; total spilled ${spilled.get() / 1e6}%.1f MB")
  }
}
