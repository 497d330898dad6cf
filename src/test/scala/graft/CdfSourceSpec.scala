package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** streaming/CdfSource.scala — the change feeds as Structured
  * Streaming sources. The Delta/Paimon spellings are oracle-gated
  * (`stream_{delta,paimon}_cdf_source`); this spec pins the Iceberg
  * and Hudi variants plus the offset-resume contract at unit scale. */
class CdfSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def runOnce(tableDir: String, fmt: String, ckpt: String,
                      out: String, extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft.streaming.CdfSourceProvider")
      .option("path", tableDir).option("format", fmt)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def fresh(n: String): String = {
    // the ops writers expect ABSOLUTE table dirs (the _metadata
    // file_path joins key on absolute paths)
    val p = new java.io.File(s"target/stream/cdfspec_$n").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  test("iceberg incremental skips REPLACE snapshots: state motion is not change") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    val dir = fresh("ice_repl")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    IcebergWriter.rewriteDataFiles(spark, dir, Some("p")): Unit
    val s3 = IcebergWriter.append(spark, dir, Seq((3L, "A")).toDF("k", "p"),
      Some("p"))
    // the rewrite's fresh copies of k=1,2 must NOT ship as appends
    val inc = IcebergLite.readIncremental(spark, dir, s1, s3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(inc == Set(3L),
      s"a REPLACE snapshot's files are state motion, not change: $inc")
  }

  test("iceberg CDC feed: overwrite ships deletes+inserts, truncate ships deletes, rewrite skipped") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    val dir = fresh("ice_cdc_ops")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    // INSERT OVERWRITE: a DATA change — old rows ship as deletes, new as inserts
    val s2v = IcebergWriter.overwrite(spark, dir,
      Seq((3L, "A"), (4L, "B")).toDF("k", "p"), Some("p"))
    val w1 = IcebergLite.readChangesCdc(spark, dir, s1, s2v)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w1 == Set((1L, "delete"), (2L, "delete"),
      (3L, "insert"), (4L, "insert")), s"overwrite window: $w1")
    // rewrite_data_files: STATE MOTION — the CDC feed ships nothing
    IcebergWriter.rewriteDataFiles(spark, dir, Some("p")): Unit
    val s3 = IcebergWriter.append(spark, dir, Seq((5L, "A")).toDF("k", "p"),
      Some("p"))
    val w2 = IcebergLite.readChangesCdc(spark, dir, s2v, s3)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w2 == Set((5L, "insert")),
      s"a rewrite's file churn must not ship as change: $w2")
    // TRUNCATE: every live row ships as a delete
    val s4 = IcebergWriter.truncateTable(spark, dir)
    val w3 = IcebergLite.readChangesCdc(spark, dir, s3, s4)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w3 == Set((3L, "delete"), (4L, "delete"), (5L, "delete")),
      s"truncate window: $w3")
    // deletes respect the PREDECESSOR's row-level state: a position-
    // deleted row must not resurrect in a later overwrite/truncate window
    val s5 = IcebergWriter.append(spark, dir,
      Seq((6L, "A"), (7L, "A")).toDF("k", "p"), Some("p"))
    IcebergWriter.deleteRows(spark, dir, $"k" === 6L): Unit
    val s7 = IcebergWriter.truncateTable(spark, dir)
    val w4 = IcebergLite.readChangesCdc(spark, dir, s5, s7)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w4 == Set((7L, "delete")),
      s"only the LIVE rows of a truncated snapshot ride as deletes: $w4")
  }

  test("hudi feed across a lazy file-group creation: fresh bases ship as inserts") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.HudiLite
    val dir = fresh("hudi_lazy")
    HudiLite.createTable(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "001")
    // one deltacommit carrying BOTH a log (existing partition) and a
    // fresh base group (never-seen partition)
    HudiLite.upsert(spark, dir,
      Seq((2L, "A", 200), (9L, "Z", 90)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "002")
    val w = HudiLite.readIncrementalMor(spark, dir, "001", "002")
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w == Set((2L, "upsert"), (9L, "insert")),
      s"fresh-partition bases must ride as inserts, logs as upserts: $w")
  }

  test("iceberg incremental source: initial snapshot, appends-only windows, resume") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.IcebergWriter
    val (dir, ckpt, out) = (fresh("ice_t"), fresh("ice_c"), fresh("ice_o"))
    IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    runOnce(dir, "iceberg", ckpt, out)
    IcebergWriter.append(spark, dir, Seq((3L, "A")).toDF("k", "p"), Some("p"))
    IcebergWriter.append(spark, dir, Seq((4L, "B")).toDF("k", "p"), Some("p"))
    runOnce(dir, "iceberg", ckpt, out)
    val events = spark.read.parquet(out)
    assert(events.groupBy($"k", $"_CHANGE_TYPE").count()
      .filter($"count" > 1).count() == 0, "resume must not replay windows")
    assert(events.select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(events.select("_CHANGE_TYPE").distinct().collect()
      .map(_.getString(0)).toSet == Set("insert"))
  }

  test("hudi incremental source: upsert/delete windows ride _CHANGE_TYPE, resume") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.HudiLite
    val (dir, ckpt, out) = (fresh("hudi_t"), fresh("hudi_c"), fresh("hudi_o"))
    HudiLite.createTable(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v"),
      Seq("k"), "p", "001")
    runOnce(dir, "hudi", ckpt, out, Map("keycols" -> "k"))
    HudiLite.upsert(spark, dir, Seq((2L, "A", 200)).toDF("k", "p", "v"),
      Seq("k"), "p", "002"): Unit
    HudiLite.deleteKeys(spark, dir, Seq(3L).toDF("k"), Seq("k"), "003")
    runOnce(dir, "hudi", ckpt, out, Map("keycols" -> "k"))
    val events = spark.read.parquet(out)
    assert(events.groupBy($"k", $"_CHANGE_TYPE").count()
      .filter($"count" > 1).count() == 0, "resume must not replay windows")
    val byType = events.groupBy("_CHANGE_TYPE")
      .agg(collect_set($"k").as("ks")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(byType("insert") == Set(1L, 2L, 3L))
    assert(byType("upsert") == Set(2L))
    assert(byType("delete") == Set(3L))
  }
}
