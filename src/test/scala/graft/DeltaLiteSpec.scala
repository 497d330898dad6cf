package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.DeltaLite

/** ops/DeltaLite.scala — protocol-replay semantics: add/remove
  * ordering, re-add after remove (last action wins), version time
  * travel, pruning during replay, loud empty results. */
class DeltaLiteSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir: String = {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "A", 1)).toDF("k", "p", "v")
    val dir = new java.io.File("target/delta/spec_table").getAbsolutePath
    DeltaLite.writeFixtureTable(spark, dir, df, Seq(
      DeltaLite.Commit(adds = Seq(
        "A" -> Seq(Row(1L, "A", 1), Row(2L, "A", 2)),
        "B" -> Seq(Row(3L, "B", 3)))),
      DeltaLite.Commit(removes = Seq("data/c0_f0_A.parquet")),
      DeltaLite.Commit(adds = Seq("A" -> Seq(Row(1L, "A", 11))))))
    dir
  }

  private def ks(version: Option[Long]): Set[(Long, Int)] =
    DeltaLite.readVersion(spark, tableDir, version)
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getInt(2 - 1))).toSet

  test("replay: remove drops the file, later re-add brings new content") {
    assert(ks(Some(0L)) == Set(1L -> 1, 2L -> 2, 3L -> 3), "version 0")
    assert(ks(Some(1L)) == Set(3L -> 3), "version 1: A file removed")
    assert(ks(None) == Set(3L -> 3, 1L -> 11),
      "version 2: re-added A content (new file), old A rows stay gone")
  }

  test("pruning during replay plans only matching partitions") {
    val files = DeltaLite.planFiles(tableDir,
      partFilter = Some(_.get("part").contains("B")))
    assert(files.nonEmpty && files.forall(_._2.get("part").contains("B")))
  }

  test("checkpoint replay reconstructs expired state; pre-checkpoint travel is loud") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "A", 1)).toDF("k", "p", "v")
    val dir = new java.io.File("target/delta/spec_cp_table").getAbsolutePath
    DeltaLite.writeFixtureTable(spark, dir, df, Seq(
      DeltaLite.Commit(adds = Seq(
        "A" -> Seq(Row(1L, "A", 1)), "B" -> Seq(Row(2L, "B", 2)))),
      DeltaLite.Commit(adds = Seq("C" -> Seq(Row(3L, "C", 3)))),
      DeltaLite.Commit(removes = Seq("data/c0_f1_B.parquet"))))
    val before = DeltaLite.readVersion(spark, dir)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    DeltaLite.writeCheckpoint(spark, dir, 1L)
    assert(DeltaLite.expireLog(dir, 1L).size == 2)
    // JSON-only replay is blind now; the checkpoint path is not
    assert(DeltaLite.planFiles(dir).isEmpty)
    val after = DeltaLite.readVersion(spark, dir)
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(after == before && after == Set(1L, 3L),
      s"checkpoint replay must match the pre-expiry state: $after vs $before")
    // checkpoint + pruning compose
    val pruned = DeltaLite.planFilesWithCheckpoint(spark, dir,
      partFilter = Some(_.get("part").contains("A")))
    assert(pruned.map(_._1) == Seq("data/c0_f0_A.parquet"))
    // a version below the checkpoint needs the expired commits: loud
    intercept[IllegalArgumentException] {
      DeltaLite.readVersion(spark, dir, version = Some(0L))
    }
    // PROTOCOL.md conformance: the checkpoint must carry exactly one
    // protocol and one metaData action (after expiry it is their ONLY
    // holder — commit 0 held them and is gone), the live adds, and no
    // tombstones (the only remove happened AFTER the checkpoint version)
    val cp = spark.read.parquet(s"$dir/_delta_log/" + f"${1L}%020d.checkpoint.parquet")
    assert(cp.where("protocol IS NOT NULL").count() == 1)
    assert(cp.where("metaData IS NOT NULL").count() == 1)
    assert(cp.where("add IS NOT NULL").count() == 3, "v1 state: 3 live files")
    assert(cp.where("remove IS NOT NULL").count() == 0)
    val proto = cp.where("protocol IS NOT NULL")
      .selectExpr("protocol.minReaderVersion", "protocol.minWriterVersion").head()
    assert((proto.getInt(0), proto.getInt(1)) == (1, 2))
    val md = cp.where("metaData IS NOT NULL")
      .selectExpr("metaData.partitionColumns", "metaData.format.provider").head()
    assert(md.getSeq[String](0) == Seq("part") && md.getString(1) == "parquet")
  }

  test("checkpoint past a remove carries the tombstone") {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "A", 1)).toDF("k", "p", "v")
    val dir = new java.io.File("target/delta/spec_cp_tomb").getAbsolutePath
    DeltaLite.writeFixtureTable(spark, dir, df, Seq(
      DeltaLite.Commit(adds = Seq(
        "A" -> Seq(Row(1L, "A", 1)), "B" -> Seq(Row(2L, "B", 2)))),
      DeltaLite.Commit(removes = Seq("data/c0_f1_B.parquet"))))
    DeltaLite.writeCheckpoint(spark, dir, 1L)
    val cp = spark.read.parquet(s"$dir/_delta_log/" + f"${1L}%020d.checkpoint.parquet")
    assert(cp.where("add IS NOT NULL").count() == 1)
    val tomb = cp.where("remove IS NOT NULL").selectExpr("remove.path").collect()
    assert(tomb.map(_.getString(0)).toSeq == Seq("data/c0_f1_B.parquet"))
    // adds in a checkpoint are state, not change
    assert(cp.where("add IS NOT NULL").selectExpr("add.dataChange")
      .head().getBoolean(0) == false)
  }

  test("a version beyond the log or an empty replay fails loudly") {
    intercept[IllegalArgumentException] {
      DeltaLite.planFiles(tableDir, Some(-1L))
    }
    intercept[IllegalArgumentException] {
      DeltaLite.readVersion(spark, tableDir,
        partFilter = Some(_.get("part").contains("Z")))
    }
  }
}
