package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{PaimonLite, PaimonWriter}

/** ops/PaimonWriter.scala — the Paimon single-writer commit path:
  * written layouts must replay with the independent PaimonLite chain,
  * sequences must stay monotone across commits so the LSM merge picks
  * the latest write, buckets must be stable per key, and the LATEST
  * hint must move only on success. */
class PaimonWriterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir: String = {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val c1 = Seq(("A", 1L, 10), ("A", 2L, 20), ("B", 3L, 30)).toDF("p", "k", "v")
    val s1 = PaimonWriter.append(spark, dir, c1, "p", Seq("p", "k"), numBuckets = 2)
    // upsert k=2 and delete k=3 in one commit (mixed kinds)
    val c2 = Seq(("A", 2L, 222, PaimonLite.KindUpdateAfter),
        ("B", 3L, 0, PaimonLite.KindDelete))
      .toDF("p", "k", "v", "_VALUE_KIND")
    val s2id = PaimonWriter.append(spark, dir, c2, "p", Seq("p", "k"), numBuckets = 2)
    assert(s1 == 1L && s2id == 2L)
    dir
  }

  private def kv(snap: Option[Long]): Map[Long, Int] =
    PaimonLite.readSnapshot(spark, tableDir, Seq("p", "k"), snap)
      .select(col("k"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("round trip: LSM merge of written commits, time travel intact") {
    assert(kv(None) == Map(1L -> 10, 2L -> 222),
      "k=2 upserted by the later sequence, k=3 deleted")
    assert(kv(Some(1L)) == Map(1L -> 10, 2L -> 20, 3L -> 30),
      "snapshot 1 = the first commit only")
  }

  test("sequences are monotone across commits (footer-derived floor)") {
    val files = PaimonLite.planFiles(tableDir)
    val s1Max = files.filter(_.path.contains("data-w1")).map(_.maxSeq).max
    val s2Min = files.filter(_.path.contains("data-w2")).map(_.minSeq).min
    assert(s2Min > s1Max, s"commit 2 sequences must exceed commit 1's: $files")
  }

  test("bucket layout: stable per key, one file per (part,bucket) per commit") {
    val files = PaimonLite.planFiles(tableDir)
    assert(files.groupBy(f => (f.part, f.bucket, f.path.take(f.path.indexOf("-w") + 3)))
      .values.forall(_.size == 1))
    // partition pruning works on the written layout
    val pruned = PaimonLite.planFiles(tableDir, partFilter = Some(_ == "B"))
    assert(pruned.nonEmpty && pruned.forall(_.part.contains("B")))
    // a different bucket count on append is rejected loudly
    val s2 = spark
    import s2.implicits._
    intercept[IllegalArgumentException] {
      PaimonWriter.append(spark, tableDir,
        Seq(("A", 9L, 9)).toDF("p", "k", "v"), "p", Seq("p", "k"), numBuckets = 3)
    }
  }

  test("incremental changelog over written commits carries RowKind") {
    val inc = PaimonLite.readIncremental(spark, tableDir, 1L, 2L)
      .select(col("k"), col("_VALUE_KIND")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(inc == Set(2L -> PaimonLite.KindUpdateAfter,
      3L -> PaimonLite.KindDelete))
  }

  test("empty append rejected; LATEST unmoved") {
    val s2 = spark
    import s2.implicits._
    val before = java.nio.file.Files.readString(java.nio.file.Paths.get(
      tableDir, "snapshot", "LATEST")).trim
    intercept[IllegalArgumentException] {
      PaimonWriter.append(spark, tableDir,
        Seq.empty[(String, Long, Int)].toDF("p", "k", "v"), "p", Seq("p", "k"),
        numBuckets = 2)
    }
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      tableDir, "snapshot", "LATEST")).trim == before)
  }
}
