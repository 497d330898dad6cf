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

  test("snapshot expiry reclaims only expired-reachable files; reads survive") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_expire").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 10), ("B", 2L, 20)).toDF("p", "k", "v"), "p", Seq("p", "k"))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 111, PaimonLite.KindUpdateAfter))
        .toDF("p", "k", "v", "_VALUE_KIND"), "p", Seq("p", "k"))
    PaimonWriter.append(spark, dir,
      Seq(("B", 3L, 30)).toDF("p", "k", "v"), "p", Seq("p", "k"))
    def state: Map[Long, Int] =
      PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val before = state
    val deleted = PaimonWriter.expireSnapshots(dir, keepLast = 1)
    // every expired commit's data is still LIVE in snapshot 3 (LSM
    // keeps all sequence layers), so only superseded metadata dies
    assert(deleted.nonEmpty && deleted.forall(p =>
        p.contains("/manifest/") || p.contains("/snapshot/")),
      s"live data files must survive expiry: $deleted")
    assert(state == before && before == Map(1L -> 111, 2L -> 20, 3L -> 30))
    // the expired snapshots are gone: loud failure, EARLIEST advanced
    intercept[IllegalArgumentException] {
      PaimonLite.readSnapshot(spark, dir, Seq("p", "k"), Some(1L)).collect()
    }
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      dir, "snapshot", "EARLIEST")).trim == "3")
    // expiry with nothing to do is a no-op
    assert(PaimonWriter.expireSnapshots(dir, keepLast = 5).isEmpty)
  }

  test("append-only table: plain scan, time travel, type guard") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_ao").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val s1 = PaimonWriter.appendOnly(spark, dir,
      Seq(("A", 1L), ("A", 2L), ("B", 3L)).toDF("p", "k"), "p")
    val s2id = PaimonWriter.appendOnly(spark, dir,
      Seq(("A", 1L), ("B", 4L)).toDF("p", "k"), "p") // duplicate k=1 SURVIVES
    assert(s1 == 1L && s2id == 2L)
    def ks(snap: Option[Long]): Seq[Long] =
      PaimonLite.readAppendOnly(spark, dir, snap)
        .select("k").collect().map(_.getLong(0)).toSeq.sorted
    assert(ks(None) == Seq(1L, 1L, 2L, 3L, 4L),
      "append-only keeps duplicates — no merge engine runs")
    assert(ks(Some(1L)) == Seq(1L, 2L, 3L))
    assert(PaimonLite.readAppendOnly(spark, dir,
        partFilter = Some(_ == "B")).select("k")
      .collect().map(_.getLong(0)).toSet == Set(3L, 4L))
    // PK append on an append-only table is a type violation
    intercept[IllegalArgumentException] {
      PaimonWriter.append(spark, dir,
        Seq(("A", 9L)).toDF("p", "k"), "p", Seq("p", "k"))
    }
  }

  test("changelog-producer=input: stream survives, markers enforced") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_cl").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 10), ("B", 2L, 20)).toDF("p", "k", "v"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true)
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 111, PaimonLite.KindUpdateAfter),
          ("B", 2L, 0, PaimonLite.KindDelete))
        .toDF("p", "k", "v", "_VALUE_KIND"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true)
    // the changelog over (1, 2] ships the INPUT records with RowKind —
    // not the folded state
    val cl = PaimonLite.readChangelog(spark, dir, 1L, 2L)
      .select(col("k"), col("_VALUE_KIND")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(cl == Set((1L, PaimonLite.KindUpdateAfter),
      (2L, PaimonLite.KindDelete)), s"changelog = input records: $cl")
    // full-window changelog includes the creation inserts
    assert(PaimonLite.readChangelog(spark, dir, 0L, 2L).count() == 4L)
    // changelog files are separate bytes from data files (a compaction
    // dropping data files must not drop the stream)
    val live = PaimonLite.planFiles(dir).map(_.path).toSet
    assert(live.forall(!_.contains("changelog-")),
      "data plan must not include changelog files")
    // the snapshot read still folds correctly
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSet ==
      Set((1L, 111)))
    // producer setting cannot silently change mid-table
    intercept[IllegalArgumentException] {
      PaimonWriter.append(spark, dir,
        Seq(("A", 7L, 70)).toDF("p", "k", "v"),
        "p", Seq("p", "k"), numBuckets = 2, changelogProducer = false)
    }
    // a COMPACT snapshot inside the window is STATE MOTION — the
    // changelog read SKIPS it (surviving compaction is the producer's
    // whole point) instead of throwing on its missing changelog list
    PaimonWriter.compact(spark, dir, Seq("p", "k"), "p"): Unit // snapshot 3
    PaimonWriter.append(spark, dir,
      Seq(("A", 9L, 90, PaimonLite.KindInsert))
        .toDF("p", "k", "v", "_VALUE_KIND"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true) // snapshot 4
    val clAcross = PaimonLite.readChangelog(spark, dir, 1L, 4L)
      .select(col("k"), col("_VALUE_KIND")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(clAcross == Set((1L, PaimonLite.KindUpdateAfter),
      (2L, PaimonLite.KindDelete), (9L, PaimonLite.KindInsert)),
      s"the stream must survive the compaction snapshot: $clAcross")
    // a producer-less table refuses changelog reads loudly
    val plain = new java.io.File("target/paimon/writer_spec_nocl").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(plain))
    PaimonWriter.append(spark, plain,
      Seq(("A", 1L, 1)).toDF("p", "k", "v"), "p", Seq("p", "k"))
    intercept[IllegalArgumentException] {
      PaimonLite.readChangelog(spark, plain, 0L, 1L)
    }
  }

  test("changelog window SPANNING a retype: old frames read under their own schema") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_cl_rt").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 10), ("B", 2L, 20)).toDF("p", "k", "v"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true) // snap 1
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 111, PaimonLite.KindUpdateAfter))
        .toDF("p", "k", "v", "_VALUE_KIND"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true) // snap 2
    // the retype rewrite (COMPACT snapshot 3, new schemaId): v INT → STRING
    PaimonWriter.retypeColumn(spark, dir, "v", "string",
      Seq("p", "k"), "p"): Unit
    PaimonWriter.append(spark, dir,
      Seq(("B", 9L, "90", PaimonLite.KindInsert))
        .toDF("p", "k", "v", "_VALUE_KIND"),
      "p", Seq("p", "k"), numBuckets = 2, changelogProducer = true) // snap 4
    // a window spanning the retype: pre-retype changelog files (INT)
    // resolve under THEIR snapshot's schema and cast to the current
    // STRING type — one well-typed frame, retype itself quiet
    val w = PaimonLite.readChangelog(spark, dir, 0L, 4L)
    assert(w.schema("v").dataType == org.apache.spark.sql.types.StringType,
      s"spanning window aligns to the current type: ${w.schema}")
    val got = w.select(col("k"), col("v"), col("_VALUE_KIND")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      (1L, "10", PaimonLite.KindInsert), (2L, "20", PaimonLite.KindInsert),
      (1L, "111", PaimonLite.KindUpdateAfter),
      (9L, "90", PaimonLite.KindInsert)),
      s"pre-retype frames must carry their values cast, retype quiet: $got")
    // a post-retype-only window stays native
    val post = PaimonLite.readChangelog(spark, dir, 3L, 4L)
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(post == Set((9L, "90")), s"post-retype window: $post")
  }

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

  test("concurrent append/append on DISJOINT keys: loser retries and lands") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_conc").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 1), ("B", 2L, 2)).toDF("p", "k", "v"), "p", Seq("p", "k"),
      numBuckets = 2): Unit
    // writer X stages keys {3,4}; before its CAS, writer Y commits {5,6}
    val id = PaimonWriter.append(spark, dir,
      Seq(("A", 3L, 3), ("B", 4L, 4)).toDF("p", "k", "v"), "p", Seq("p", "k"),
      numBuckets = 2,
      beforeCommit = () => {
        PaimonWriter.append(spark, dir,
          Seq(("A", 5L, 5), ("B", 6L, 6)).toDF("p", "k", "v"), "p",
          Seq("p", "k"), numBuckets = 2): Unit
      })
    assert(id == 3L, s"loser must land on snapshot 3, got $id")
    assert((1L to 3L).forall(i => new java.io.File(
      dir, s"snapshot/snapshot-$i").exists()), "three snapshots on the chain")
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .select("k").collect().map(_.getLong(0)).toSet == (1L to 6L).toSet,
      "no lost update: both concurrent commits visible")
  }

  test("concurrent append/append on the SAME key fails loudly (no arbitrary order)") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_conc2").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.append(spark, dir,
      Seq(("A", 1L, 1)).toDF("p", "k", "v"), "p", Seq("p", "k"),
      numBuckets = 2): Unit
    val e = intercept[IllegalArgumentException] {
      PaimonWriter.append(spark, dir,
        Seq(("A", 7L, 70)).toDF("p", "k", "v"), "p", Seq("p", "k"),
        numBuckets = 2,
        beforeCommit = () => {
          PaimonWriter.append(spark, dir,
            Seq(("A", 7L, 71)).toDF("p", "k", "v"), "p", Seq("p", "k"),
            numBuckets = 2): Unit
        })
    }
    assert(e.getMessage.contains("SAME keys"))
    // the winner's value stands; the loser left no snapshot
    assert(PaimonLite.latestSnapshotId(dir) == 2L)
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .filter($"k" === 7L).select("v").head().getInt(0) == 71)
  }

  test("concurrent append-only appends: retry unconditional, duplicates intact") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_conc3").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    PaimonWriter.appendOnly(spark, dir,
      Seq(("A", 1L)).toDF("p", "k"), "p"): Unit
    // append-only has no keys: even the SAME row retries safely
    // (duplicates are facts on an append table) — writer Y lands
    // snapshot 2 while X holds id 2, X retries onto 3
    val id = PaimonWriter.appendOnly(spark, dir,
      Seq(("A", 2L)).toDF("p", "k"), "p",
      beforeCommit = () => {
        PaimonWriter.appendOnly(spark, dir,
          Seq(("A", 2L)).toDF("p", "k"), "p"): Unit
      })
    assert(id == 3L)
    assert(PaimonLite.readAppendOnly(spark, dir)
      .select("k").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 2L))
  }

  test("batch re-check under the commit: raced redelivery skipped, no residue") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_batch").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    assert(PaimonWriter.appendBatch(spark, dir,
      Seq(("A", 1L, 1)).toDF("p", "k", "v"), "p", Seq("p", "k"), batchId = 0L,
      numBuckets = 2).contains(1L))
    assert(PaimonWriter.appendBatch(spark, dir,
      Seq(("A", 2L, 2)).toDF("p", "k", "v"), "p", Seq("p", "k"), batchId = 1L,
      numBuckets = 2).contains(2L))
    // a sink whose pre-check raced a concurrent commit of the same
    // batch reaches append() with a fresh snapshot id — the re-check
    // under the commit must skip (-1), leaving no snapshot and no
    // staged data files behind
    val dataBefore = PaimonLite.planFiles(dir).map(_.path).toSet
    assert(PaimonWriter.append(spark, dir,
      Seq(("A", 9L, 9)).toDF("p", "k", "v"), "p", Seq("p", "k"),
      numBuckets = 2, batchId = Some(1L)) == -1L,
      "re-check under the commit must skip an already-committed batch")
    assert(PaimonLite.latestSnapshotId(dir) == 2L, "no snapshot landed")
    assert(PaimonLite.planFiles(dir).map(_.path).toSet == dataBefore)
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("expiry publishes the EARLIEST floor before deleting snapshot JSONs") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_expire_order").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    (1 to 4).foreach { i =>
      PaimonWriter.append(spark, dir,
        Seq(("A", i.toLong, i)).toDF("p", "k", "v"), "p", Seq("p", "k"),
        numBuckets = 2): Unit
    }
    val deleted = PaimonWriter.expireSnapshots(dir, keepLast = 2)
    assert(deleted.exists(_.contains("snapshot-1")) &&
      deleted.exists(_.contains("snapshot-2")))
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      dir, "snapshot", "EARLIEST")).trim == "3",
      "EARLIEST must hold the new floor")
    // readers that walk earliest..latest stay consistent after expiry
    assert(PaimonWriter.committedBatchIds(dir) == Set.empty[Long])
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
  }

  test("leveled PARTIAL compaction: small L0 debt rewrites small, tombstones kept") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/paimon/writer_spec_partial").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // a dominant base: 20k rows, one bucket, then FULL-compact to max level
    val base = spark.range(0, 20000)
      .selectExpr("'A' AS p", "id AS k", "CAST(id AS INT) AS v")
    PaimonWriter.append(spark, dir, base, "p", Seq("p", "k"), numBuckets = 1): Unit
    assert(PaimonWriter.compact(spark, dir, Seq("p", "k"), "p") > 0)
    val maxFiles = PaimonLite.planFiles(dir)
      .filter(_.level == PaimonWriter.MaxLevel).map(_.path).toSet
    assert(maxFiles.nonEmpty)
    val fullBytes = maxFiles.map(p => new java.io.File(dir, p).length()).sum
    // small L0 debt: one upsert + one delete
    PaimonWriter.append(spark, dir,
      Seq(("A", 7L, 777, PaimonLite.KindUpdateAfter),
        ("A", 9L, 0, PaimonLite.KindDelete))
        .toDF("p", "k", "v", "_VALUE_KIND"),
      "p", Seq("p", "k"), numBuckets = 1): Unit
    val snap = PaimonWriter.compact(spark, dir, Seq("p", "k"), "p")
    assert(snap > 0)
    val after = PaimonLite.planFiles(dir)
    // PARTIAL: the max-level base carried forward VERBATIM — the
    // rewrite touched only the L0 debt
    assert(after.filter(_.level == PaimonWriter.MaxLevel).map(_.path).toSet
      == maxFiles, "partial compaction must not rewrite the compacted tail")
    val mid = after.filter(f =>
      f.level > 0 && f.level < PaimonWriter.MaxLevel)
    assert(mid.nonEmpty, "partial compaction must land an intermediate level")
    val midBytes = mid.map(f => new java.io.File(dir, f.path).length()).sum
    assert(midBytes * 4 < fullBytes,
      s"partial rewrite ($midBytes B) must be far below the bucket ($fullBytes B)")
    // the -D tombstone is KEPT below max level (it must keep masking
    // the base row for k=9)...
    val midRows = spark.read.parquet(mid.map(f => s"$dir/${f.path}"): _*)
    assert(midRows.filter(col("_VALUE_KIND") === PaimonLite.KindDelete)
      .count() == 1, "a -D winner below max level must survive the rewrite")
    // ...and the merged read reflects upsert + delete exactly
    val got = PaimonLite.readSnapshot(spark, dir, Seq("p", "k"))
      .filter(col("k").isin(7L, 9L) || col("k") === 8L)
      .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(7L -> 777, 8L -> 8), s"merged view after partial: $got")
    // a later FULL compaction (L0-free bucket) folds the tombstone away
    val snap3 = PaimonWriter.compact(spark, dir, Seq("p", "k"), "p")
    assert(snap3 > 0)
    val finalFiles = PaimonLite.planFiles(dir)
    assert(finalFiles.forall(_.level == PaimonWriter.MaxLevel))
    assert(PaimonLite.readSnapshot(spark, dir, Seq("p", "k")).count() == 19999L)
  }

  test("compaction after RENAME COLUMN keeps the stored WRITE names") {
    // r15 regression: compact staged its merged frame LOGICAL-named, so
    // a renamed table's compacted files carried the logical column name
    // while later scans plan the WRITE name — silent null-fill (caught
    // as ROW_VALUE_IS_NULL on the PK window). The merge input now reads
    // write-named end-to-end.
    val s2 = spark
    import s2.implicits._
    spark.sql("SELECT * FROM VALUES (1L,'A',10),(2L,'A',20) t(k,p,v)")
      .createOrReplaceTempView("pw_rc_src")
    spark.sql("CREATE OR REPLACE TABLE graft_paimon.pw_rc PRIMARY KEY (p, k) " +
      "PARTITIONED BY (p) AS SELECT * FROM pw_rc_src")
    spark.sql("ALTER TABLE graft_paimon.pw_rc RENAME COLUMN v TO w")
    spark.sql("INSERT INTO graft_paimon.pw_rc SELECT 1 AS k, 'A' AS p, 11 AS w")
    spark.sql("OPTIMIZE graft_paimon.pw_rc")
    val got = spark.sql("SELECT k, w FROM graft_paimon.pw_rc ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 11), (2L, 20)), s"rename+compact: $got")
    // the compacted base stays a live LSM level: a later upsert wins
    spark.sql("INSERT INTO graft_paimon.pw_rc SELECT 2 AS k, 'A' AS p, 22 AS w")
    assert(spark.sql("SELECT w FROM graft_paimon.pw_rc WHERE k = 2")
      .head().getInt(0) == 22)
  }
}
