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
