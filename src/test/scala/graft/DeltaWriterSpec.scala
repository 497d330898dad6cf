package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DeltaLite, DeltaWriter}

/** ops/DeltaWriter.scala — the Delta single-writer commit path: every
  * layout artifact must replay with the independent DeltaLite reader,
  * the automatic checkpoint cadence must make expired logs survivable,
  * and partition deletes must tombstone without touching data bytes. */
class DeltaWriterSpec extends AnyFunSuite {
  import TestSpark._

  test("append/delete round trip with version history") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val v0 = DeltaWriter.append(spark, dir,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    val v1 = DeltaWriter.append(spark, dir,
      Seq((3L, "A", 30)).toDF("k", "p", "v"), partCol = Some("p"))
    assert(v0 == 0L && v1 == 1L)
    def ks(version: Option[Long]): Set[Long] =
      DeltaLite.readVersion(spark, dir, version)
        .select("k").collect().map(_.getLong(0)).toSet
    assert(ks(None) == Set(1L, 2L, 3L))
    assert(ks(Some(0L)) == Set(1L, 2L))
    // partition delete: B is tombstoned, its bytes stay on disk
    val bytesBefore = new java.io.File(dir, "data").listFiles().length
    DeltaWriter.deleteWhere(spark, dir, _.get("p").contains("B"))
    assert(ks(None) == Set(1L, 3L))
    assert(new java.io.File(dir, "data").listFiles().length == bytesBefore,
      "remove is a tombstone, not a physical delete")
    // and pruning on the written layout works
    val pruned = DeltaLite.planFilesWithCheckpoint(spark, dir,
      partFilter = Some(_.get("p").contains("A")))
    assert(pruned.size == 2 && pruned.forall(_._2("p") == "A"))
  }

  test("automatic checkpoint at the cadence makes expired logs survivable") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_cp").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (0 until 12).foreach { i =>
      DeltaWriter.append(spark, dir,
        Seq((i.toLong, "A", i)).toDF("k", "p", "v"), partCol = Some("p"))
    }
    val lastCp = new java.io.File(dir, "_delta_log/_last_checkpoint")
    assert(lastCp.exists(), "checkpoint must fire at the cadence")
    assert(java.nio.file.Files.readString(lastCp.toPath).contains("\"version\":10"))
    // expire everything the checkpoint covers; replay must still work
    val expired = DeltaLite.expireLog(dir, 10L)
    assert(expired.size == 11, s"commits 0..10 expired: $expired")
    val ks = DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == (0L until 12L).toSet,
      "checkpoint + tail replay must reconstruct all 12 commits")
  }

  test("column mapping: physical names on disk, logical names on read") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_cm").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.appendMapped(spark, dir,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    DeltaWriter.appendMapped(spark, dir,
      Seq((3L, "A", 30)).toDF("k", "p", "v"), partCol = Some("p"))
    // physical layout: parquet columns are col_N, partition values keyed
    // by the physical name
    val adds = DeltaLite.planAddsWithCheckpoint(spark, dir)
    assert(adds.forall(_.partitionValues.keySet == Set("col_2")),
      s"partition values must be keyed physically: $adds")
    val raw = spark.read.parquet(s"$dir/${adds.head.path}")
    assert(raw.columns.toSet == Set("col_1", "col_2", "col_3"),
      s"parquet must carry physical names: ${raw.columns.toSeq}")
    // logical read
    val got = DeltaLite.readVersion(spark, dir)
      .select("k", "p", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)))
    // the established physical names survive later appends (commit 2's
    // files use the same mapping)
    assert(DeltaLite.columnMapping(spark, dir) ==
      Seq("k" -> "col_1", "p" -> "col_2", "v" -> "col_3"))
  }

  test("txn idempotence survives checkpoint and log expiry") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_txn").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val app = "specapp"
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((1L, 1)).toDF("k", "v"), app, 0L).isDefined)
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((2L, 2)).toDF("k", "v"), app, 1L).isDefined)
    // redelivery of an old version is a no-op
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((9L, 9)).toDF("k", "v"), app, 0L).isEmpty)
    assert(DeltaLite.lastTxnVersion(spark, dir, app).contains(1L))
    assert(DeltaLite.lastTxnVersion(spark, dir, "other").isEmpty)
    // the txn watermark must survive checkpoint + expiry of its commits
    DeltaLite.writeCheckpoint(spark, dir, 1L)
    assert(DeltaLite.expireLog(dir, 1L).size == 2)
    assert(DeltaLite.lastTxnVersion(spark, dir, app).contains(1L),
      "checkpoint txn rows must keep redelivery detection alive")
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((9L, 9)).toDF("k", "v"), app, 1L).isEmpty)
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("DV delete upgrades the protocol to reader 3 / writer 7 + features") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_proto").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 10L).map(k => (k, k.toInt)).toDF("k", "v"), partCol = None)
    DeltaWriter.deleteRows(spark, dir, col("k") % 2 === 0)
    def protocolLines(v: Long): Seq[String] =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
        dir, "_delta_log", f"$v%020d.json")).toArray.map(_.toString)
        .filter(_.contains("\"protocol\"")).toSeq
    assert(protocolLines(0L).head.contains("\"minReaderVersion\":1"),
      "plain appends stay at the legacy protocol")
    val up = protocolLines(1L)
    assert(up.size == 1, "the first DV commit carries the upgrade action")
    assert(up.head.contains("\"minReaderVersion\":3") &&
      up.head.contains("\"minWriterVersion\":7") &&
      up.head.contains("\"readerFeatures\"") &&
      up.head.contains("\"deletionVectors\"") &&
      up.head.contains("\"appendOnly\""),
      s"spec: DV needs 3/7 + feature lists incl. the legacy-implied ones: $up")
    // a second DV commit must not re-upgrade
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    assert(protocolLines(2L).isEmpty, "protocol already supports DVs")
    // the checkpoint carries the feature lists — after log expiry it is
    // the protocol's only holder
    DeltaLite.writeCheckpoint(spark, dir, 2L)
    DeltaLite.expireLog(dir, 2L)
    val cpProto = spark.read
      .parquet(dir + "/_delta_log/" + f"${2L}%020d.checkpoint.parquet")
      .where("protocol IS NOT NULL")
      .selectExpr("protocol.minReaderVersion", "protocol.readerFeatures")
      .collect().head
    assert(cpProto.getInt(0) == 3 &&
      cpProto.getSeq[String](1).contains("deletionVectors"),
      s"checkpoint must round-trip the table-features protocol: $cpProto")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet ==
      (1L to 10L).filterNot(k => k % 2 == 0 || k % 3 == 0).toSet)
  }

  test("column mapping stamps protocol reader 2 / writer 5 on creation") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_cmproto").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.appendMapped(spark, dir,
      Seq((1L, "A", 10)).toDF("k", "p", "v"), partCol = Some("p"))
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      dir, "_delta_log", f"${0L}%020d.json")).toArray.map(_.toString)
      .filter(_.contains("\"protocol\""))
    assert(lines.size == 1 && lines.head.contains("\"minReaderVersion\":2") &&
      lines.head.contains("\"minWriterVersion\":5"),
      s"PROTOCOL.md: column mapping needs reader 2 / writer 5: ${lines.toSeq}")
    // the second mapped append does not re-stamp
    DeltaWriter.appendMapped(spark, dir,
      Seq((2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    assert(!java.nio.file.Files.readString(java.nio.file.Paths.get(
      dir, "_delta_log", f"${1L}%020d.json")).contains("\"protocol\""))
  }

  test("append after full log expiry continues the version chain") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_expver").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (0 until 11).foreach { i =>
      DeltaWriter.append(spark, dir,
        Seq((i.toLong, i)).toDF("k", "v"), partCol = None)
    }
    DeltaLite.expireLog(dir, 10L) // checkpoint-only log
    assert(Option(new java.io.File(dir, "_delta_log").listFiles()).get
      .forall(!_.getName.matches("\\d{20}\\.json")))
    // the r10 bug: nextVersion restarted at 0, which the checkpoint
    // replay filters out — a silently invisible commit
    val v = DeltaWriter.append(spark, dir,
      Seq((99L, 99)).toDF("k", "v"), partCol = None)
    assert(v == 11L, s"version chain must continue past the checkpoint: $v")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet ==
      (0L until 11L).toSet + 99L)
  }

  test("concurrent append/append: loser retries, both commits land") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_conc").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir, Seq((1L, "A", 1)).toDF("k", "p", "v"),
      partCol = Some("p"))
    // writer B takes the version between A's resolution and A's CAS:
    // POSIX rename would have silently replaced B's commit (lost
    // update); the hard-link CAS forces A to retry onto version 2
    DeltaWriter.append(spark, dir, Seq((2L, "A", 2)).toDF("k", "p", "v"),
      partCol = Some("p"),
      beforePublish = () => {
        DeltaWriter.append(spark, dir,
          Seq((3L, "B", 3)).toDF("k", "p", "v"), partCol = Some("p"))
        ()
      })
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "no lost update")
    val logDir = new java.io.File(dir, "_delta_log")
    assert((0L to 2L).forall(v =>
      new java.io.File(logDir, f"$v%020d.json").exists()),
      "three commit versions on the log")
  }

  test("vacuum reclaims unreferenced data + DV bytes; current read survives") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_vacuum").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 12L).map(k => (k, if (k % 2 == 0) "A" else "B", k.toInt))
        .toDF("k", "p", "v"), partCol = Some("p"))
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    DeltaWriter.optimize(spark, dir, partColIn = Some("p"))
    val expected = (1L to 12L).filterNot(_ % 3 == 0).toSet
    def ks: Set[Long] = DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    // pre-vacuum: old files + DV blobs still on disk, time travel works
    assert(ks == expected)
    assert(DeltaLite.readVersion(spark, dir, Some(0L))
      .select("k").collect().map(_.getLong(0)).toSet == (1L to 12L).toSet)
    val deleted = DeltaWriter.vacuum(spark, dir)
    assert(deleted.exists(_.contains("/data/")),
      s"optimize-superseded data files must be reclaimed: $deleted")
    assert(deleted.exists(_.contains("deletion_vectors")),
      "orphaned DV blobs die too (optimize purged the descriptors)")
    assert(ks == expected, "the current version survives vacuum intact")
    // time travel to the pre-optimize version now fails loudly
    intercept[Exception] {
      DeltaLite.readVersion(spark, dir, Some(0L)).collect()
    }
  }

  test("restore rewinds state metadata-only; history and DVs compose") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_restore").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 12L).map(k => (k, if (k % 2 == 0) "A" else "B", k.toInt))
        .toDF("k", "p", "v"), partCol = Some("p"))
    DeltaWriter.append(spark, dir,
      Seq((20L, "A", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    def ks: Set[Long] = DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == ((1L to 12L) :+ 20L).filterNot(_ % 3 == 0).toSet)
    // restore to version 0: the append and the DV delete both unwind
    val v = DeltaWriter.restore(spark, dir, 0L)
    assert(ks == (1L to 12L).toSet, "restored to the v0 state")
    // the restore is itself a version: restore forward to the DV state
    DeltaWriter.restore(spark, dir, 2L)
    assert(ks == ((1L to 12L) :+ 20L).filterNot(_ % 3 == 0).toSet,
      "restore composes in both directions (DV descriptors re-attach)")
    assert(v == 3L, "restore commits are ordinary versions on the log")
    // restoring to the current state is a loud no-op
    intercept[IllegalArgumentException] {
      DeltaWriter.restore(spark, dir, 2L)
    }
  }

  test("change feed: inserts, DV deletes, optimize silence, restore re-inserts") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_cdf").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 12L).filter(_ % 2 == 0).map(k => (k, "A", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    DeltaWriter.append(spark, dir,
      (1L to 12L).filter(_ % 2 == 1).map(k => (k, "A", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    def changes(from: Long, to: Long): Map[String, Set[Long]] =
      DeltaLite.readChanges(spark, dir, from, to)
        .select("_CHANGE_TYPE", "k").collect()
        .groupBy(_.getString(0)).map { case (t, rs) =>
          t -> rs.map(_.getLong(1)).toSet
        }
    assert(changes(0L, 2L) == Map(
      "insert" -> Set(1L, 3L, 5L, 7L, 9L, 11L),
      "delete" -> Set(3L, 6L, 9L, 12L)),
      "window sees the odd-append inserts and the DV-delete rows")
    assert(changes(1L, 2L) == Map("delete" -> Set(3L, 6L, 9L, 12L)))
    // OPTIMIZE is state motion: an empty frame, not a loud error
    DeltaWriter.optimize(spark, dir, partColIn = Some("p"))
    assert(DeltaLite.readChanges(spark, dir, 2L, 3L).count() == 0L)
    assert(DeltaLite.readChanges(spark, dir, 2L, 3L)
      .columns.contains("_CHANGE_TYPE"))
    // restore across the DV delete (fresh table: v0 append, v1 DV
    // delete, v2 restore to v0): the restore's DV shrink ships the
    // resurrected positions as inserts
    val dir2 = new java.io.File("target/delta/writer_spec_cdf2").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2))
    DeltaWriter.append(spark, dir2,
      (1L to 12L).map(k => (k, "A", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    DeltaWriter.deleteRows(spark, dir2, col("k") % 3 === 0)
    DeltaWriter.restore(spark, dir2, 0L)
    val got = DeltaLite.readChanges(spark, dir2, 1L, 2L)
      .select("_CHANGE_TYPE", "k").collect()
      .groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.map(_.getLong(1)).toSet }
    assert(got == Map("insert" -> Set(3L, 6L, 9L, 12L)),
      s"restore re-inserts exactly the resurrected rows: $got")
  }

  test("filesPerPart splits a hot partition; read and pruning exact") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_split").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 2000L).map(k => (k, "HOT", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"), filesPerPart = 4)
    val files = DeltaLite.planFiles(dir)
    assert(files.size > 1 && files.size <= 4,
      s"hot partition must split across up to 4 files: ${files.size}")
    assert(files.forall(_._2("p") == "HOT"))
    assert(DeltaLite.readVersion(spark, dir)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head().getLong(0) == 2000L)
  }

  test("unpartitioned append and empty-append rejection") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_unpart").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir, Seq((1L, 1)).toDF("k", "v"), partCol = None)
    assert(DeltaLite.readVersion(spark, dir).select("k").head().getLong(0) == 1L)
    intercept[IllegalArgumentException] {
      DeltaWriter.append(spark, dir,
        Seq.empty[(Long, Int)].toDF("k", "v"), partCol = None)
    }
    assert(DeltaLite.planFiles(dir).size == 1, "failed commit left no trace")
  }

  test("INSERT OVERWRITE is one atomic commit: removes + adds together") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_ovw").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    val v = DeltaWriter.overwrite(spark, dir,
      Seq((7L, "A", 70), (8L, "C", 80)).toDF("k", "p", "v"), partColIn = Some("p"))
    assert(v == 1L, "overwrite is ONE commit, not delete+append")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(7L, 8L))
    // the single commit carries both remove tombstones and adds
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(
      dir, "_delta_log", f"${1L}%020d.json"))
    assert(lines.stream().anyMatch(_.contains("\"remove\"")) &&
      lines.stream().anyMatch(_.contains("\"add\"")))
    // old state still time travels
    assert(DeltaLite.readVersion(spark, dir, Some(0L))
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("RENAME COLUMN on a mapped table: metadata-only, bytes untouched") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_ren").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.appendMapped(spark, dir,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    val dataBytes = DeltaLite.planAddsWithCheckpoint(spark, dir).map(a =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, a.path)).toSeq)
    DeltaWriter.renameColumn(spark, dir, "v", "value")
    val got = DeltaLite.readVersion(spark, dir)
      .select("k", "value").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 10), (2L, 20)), "reads bind the new logical name")
    val after = DeltaLite.planAddsWithCheckpoint(spark, dir).map(a =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, a.path)).toSeq)
    assert(after == dataBytes, "rename must not touch a data byte")
    // appends under the new name keep the established physical column
    DeltaWriter.appendMapped(spark, dir,
      Seq((3L, "A", 30)).toDF("k", "p", "value"), partCol = Some("p"))
    assert(DeltaLite.readVersion(spark, dir)
      .select("value").collect().map(_.getInt(0)).toSet == Set(10, 20, 30))
    // an UNMAPPED table upgrades to column mapping in the same commit:
    // physical names fix to the current names, no data byte moves, and
    // reads/appends bind the new logical name
    val dir2 = new java.io.File("target/delta/writer_spec_ren2").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2))
    DeltaWriter.append(spark, dir2, Seq((1L, 1)).toDF("k", "v"))
    val bytesBefore = DeltaLite.planAddsWithCheckpoint(spark, dir2).map(a =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir2, a.path)).toSeq)
    DeltaWriter.renameColumn(spark, dir2, "v", "w")
    assert(DeltaLite.columnMapping(spark, dir2).toMap == Map("k" -> "k", "w" -> "v"),
      "upgrade fixes physical names to the pre-rename names")
    assert(DeltaLite.readVersion(spark, dir2)
      .select("k", "w").collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 1)), "reads bind the new logical name after the upgrade")
    assert(DeltaLite.planAddsWithCheckpoint(spark, dir2).map(a =>
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir2, a.path)).toSeq) == bytesBefore,
      "the upgrade commit must not touch a data byte")
    DeltaWriter.appendMapped(spark, dir2, Seq((2L, 2)).toDF("k", "w"))
    assert(DeltaLite.readVersion(spark, dir2)
      .select("w").collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("txn re-check fires on attempt 0: batch committed mid-staging is skipped") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_txn0").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val app = "racer"
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((1L, 1)).toDF("k", "v"), app, 0L).isDefined)
    // sink B commits batch 1 while sink A is "staging" (i.e. before A's
    // first CAS attempt): A's direct append with the same txn must
    // return -1 (skipped), never a fresh version — the attempt-0
    // double-commit race
    assert(DeltaWriter.appendBatch(spark, dir,
      Seq((2L, 2)).toDF("k", "v"), app, 1L).isDefined)
    val v = DeltaWriter.append(spark, dir,
      Seq((99L, 99)).toDF("k", "v"), txn = Some((app, 1L)))
    assert(v == -1L, s"attempt-0 txn re-check must skip, got version $v")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "the raced batch must appear exactly once")
  }

  test("vacuum spares uncommitted (in-flight) data files, reclaims superseded ones") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/writer_spec_vacgrace").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), partCol = Some("p"))
    DeltaWriter.deleteWhere(spark, dir, _.get("p").contains("B"))
    // simulate a concurrent append's staging: a fresh parquet moved into
    // data/ before its commit CAS — committed nowhere, mtime now
    val inflight = new java.io.File(dir, "data/wInflight_X_0.parquet")
    java.nio.file.Files.writeString(inflight.toPath, "staged-not-yet-committed")
    val deleted = DeltaWriter.vacuum(spark, dir)
    assert(inflight.exists(),
      "vacuum must not reap a concurrent append's staged (uncommitted) file")
    assert(deleted.exists(_.contains("B_")) || deleted.nonEmpty,
      s"the superseded committed B file must be reclaimed: $deleted")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L))
    // with a zero grace window the orphan is reapable (long-dead writer)
    val deleted2 = DeltaWriter.vacuum(spark, dir, graceMillis = 0L)
    assert(!inflight.exists() && deleted2.exists(_.endsWith("wInflight_X_0.parquet")),
      s"grace 0 reclaims orphans: $deleted2")
  }
}
