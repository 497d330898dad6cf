package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{IcebergLite, IcebergWriter}

/** ops/IcebergWriter.scala — the single-writer commit path: every
  * layout artifact it writes must parse with the SAME readers the
  * read-path fixtures use (planFiles/readSnapshot), the version chain
  * must grow one metadata file per commit with the hint swapped last,
  * footer-derived bounds must make stats pruning work on written
  * tables, and the clustered write must produce one file per partition
  * value. */
class IcebergWriterSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir: String = {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val c1 = Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
    val c2 = Seq((4L, "A", 40), (5L, "B", 50), (6L, "C", 60)).toDF("k", "p", "v")
    val s1 = IcebergWriter.append(spark, dir, c1, partCol = Some("p"))
    val s2id = IcebergWriter.append(spark, dir, c2, partCol = Some("p"))
    assert(s1 != s2id, "each commit gets its own snapshot id")
    dir
  }

  private def keys(snap: Option[Long]): Set[Long] =
    IcebergLite.readSnapshot(spark, tableDir, snap)
      .select(col("k")).collect().map(_.getLong(0)).toSet

  test("round trip: written commits read back exactly, time travel works") {
    assert(keys(None) == Set(1L, 2L, 3L, 4L, 5L, 6L), "current snapshot")
    assert(keys(Some(1000L)) == Set(1L, 2L, 3L), "snapshot 1 = first commit only")
    // full rows, not just keys
    val got = IcebergLite.readSnapshot(spark, tableDir)
      .select("k", "p", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "A", 10), (2L, "A", 20), (3L, "B", 30),
      (4L, "A", 40), (5L, "B", 50), (6L, "C", 60)))
  }

  test("version chain: one metadata version per commit, hint points at the last") {
    val metaDir = new java.io.File(tableDir, "metadata")
    assert(new java.io.File(metaDir, "v1.metadata.json").exists())
    assert(new java.io.File(metaDir, "v2.metadata.json").exists())
    assert(java.nio.file.Files.readString(
      metaDir.toPath.resolve("version-hint.text")).trim == "2")
  }

  test("clustered write: one data file per partition value per commit") {
    val tasks = IcebergLite.planFiles(tableDir)
    assert(tasks.size == 5, s"A,B of commit 1 + A,B,C of commit 2: $tasks")
    assert(tasks.groupBy(t => (t.partValue, t.sequenceNumber))
      .values.forall(_.size == 1))
  }

  test("partition pruning plans only matching written files") {
    val pruned = IcebergLite.planFiles(tableDir, partFilter = Some(_ == "C"))
    assert(pruned.size == 1 && pruned.head.partValue.contains("C"))
  }

  test("footer stats ride the manifest and prune files") {
    val tasks = IcebergLite.planFiles(tableDir)
    assert(tasks.forall(t => t.lower.contains("k") && t.upper.contains("k")),
      s"every written file must carry k bounds: $tasks")
    // k=6 lives only in commit 2's C file
    val kept = IcebergLite.planFiles(tableDir,
      statsFilter = Some((lo, hi) => lo.get("k").forall(_ <= 6L) &&
        hi.get("k").forall(_ >= 6L)))
    assert(kept.size == 1 && kept.head.partValue.contains("C"), s"$kept")
  }

  test("unpartitioned append commits and reads back") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_unpart").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      Seq((1L, 1), (2L, 2)).toDF("k", "v"), partCol = None)
    val got = IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
    assert(IcebergLite.planFiles(dir).forall(_.partValue.isEmpty))
  }

  test("upsert commit: equality delete merges at read, history preserved") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_upsert").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v"),
      partCol = Some("p"))
    IcebergWriter.upsert(spark, dir,
      Seq((2L, "A", 200), (4L, "B", 400)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = Some("p"))
    def kv(snap: Option[Long]): Map[Long, Int] =
      IcebergLite.readSnapshot(spark, dir, snap)
        .select("k", "v").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(kv(None) == Map(1L -> 10, 2L -> 200, 3L -> 30, 4L -> 400),
      "k=2 replaced without rewriting commit 1's files; k=4 inserted")
    assert(kv(Some(1000L)) == Map(1L -> 10, 2L -> 20, 3L -> 30),
      "pre-upsert snapshot unaffected (no data rewrite happened)")
    // a second upsert of the same key layers by sequence
    IcebergWriter.upsert(spark, dir,
      Seq((2L, "A", 999)).toDF("k", "p", "v"), keyCols = Seq("k"),
      partCol = Some("p"))
    assert(kv(None) == Map(1L -> 10, 2L -> 999, 3L -> 30, 4L -> 400))
    // and commit 1's data files are untouched on disk (merge-on-write
    // writes deltas, never rewrites)
    val c1Files = IcebergLite.planFiles(dir, Some(1000L)).map(_.path).toSet
    val curFiles = IcebergLite.planFiles(dir).filter(_.content == 0).map(_.path).toSet
    assert(c1Files.subsetOf(curFiles), "upserts must not rewrite old data files")
  }

  test("position-delete commit: rows drop without data rewrite, history intact") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_posdel").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      (1L to 12L).map(k => (k, if (k % 2 == 0) "A" else "B", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    val bytes = new java.io.File(dir, "data").listFiles()
      .filter(_.getName.startsWith("w")).map(f => f.getName -> f.length()).toMap
    IcebergWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    def ks: Set[Long] = IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == (1L to 12L).filterNot(_ % 3 == 0).toSet)
    // second wave composes (both delete files apply)
    IcebergWriter.deleteRows(spark, dir, col("k") % 4 === 0)
    assert(ks == (1L to 12L).filterNot(k => k % 3 == 0 || k % 4 == 0).toSet)
    val after = new java.io.File(dir, "data").listFiles()
      .filter(_.getName.startsWith("w")).map(f => f.getName -> f.length()).toMap
    assert(after == bytes, "position deletes must not rewrite data files")
    // pre-delete snapshot still sees every row
    assert(IcebergLite.readSnapshot(spark, dir, Some(1000L))
      .select("k").collect().map(_.getLong(0)).toSet == (1L to 12L).toSet)
    intercept[IllegalArgumentException] {
      IcebergWriter.deleteRows(spark, dir, col("k") > 100L)
    }
  }

  test("partition evolution: each file prunes only under its own spec") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_evolve").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // commit 1 partitioned by p (values A,B); commit 2 repartitions the
    // table by q (values X,Y) — a spec change, not a rewrite
    IcebergWriter.append(spark, dir,
      Seq((1L, "A", "X", 1), (2L, "B", "X", 2)).toDF("k", "p", "q", "v"),
      partCol = Some("p"))
    IcebergWriter.append(spark, dir,
      Seq((3L, "A", "X", 3), (4L, "A", "Y", 4)).toDF("k", "p", "q", "v"),
      partCol = Some("q"))
    val all = IcebergLite.planFiles(dir).filter(_.content == 0)
    assert(all.size == 4, s"A,B then X,Y: $all")
    // prune by p == A: commit-1's B file drops; commit-2 files are
    // partitioned by q and must be conservatively KEPT
    val byP = IcebergLite.planFiles(dir,
      partPruneBy = Some(("p", (_: String) == "A"))).filter(_.content == 0)
    assert(byP.size == 3, s"1 of commit-1 + both of commit-2: $byP")
    // prune by q == Y: commit-2's X file drops; commit-1 files kept
    val byQ = IcebergLite.planFiles(dir,
      partPruneBy = Some(("q", (_: String) == "Y"))).filter(_.content == 0)
    assert(byQ.size == 3, s"both of commit-1 + 1 of commit-2: $byQ")
    // correctness composes: prune + residual filter = plain filter
    val got = IcebergLite.readSnapshot(spark, dir,
        partPruneBy = Some(("q", (_: String) == "Y")))
      .filter(col("q") === "Y").select("k").collect().map(_.getLong(0)).toSet
    assert(got == Set(4L))
  }

  test("rewrite folds deletes into fresh files; expiry then reclaims bytes") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_rewrite").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      (1L to 12L).map(k => (k, if (k % 2 == 0) "A" else "B", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    IcebergWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    val expected = (1L to 12L).filterNot(_ % 3 == 0).toSet
    IcebergWriter.rewriteDataFiles(spark, dir, partCol = Some("p"))
    val plan = IcebergLite.planFiles(dir)
    assert(plan.forall(_.content == 0), s"rewrite must shed delete files: $plan")
    assert(plan.size == 2, s"one compacted file per partition: $plan")
    def ks: Set[Long] = IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(ks == expected, "rewrite is a state no-op")
    // pre-rewrite snapshots still travel (deletes re-applied)
    assert(IcebergLite.readSnapshot(spark, dir, Some(1001L))
      .select("k").collect().map(_.getLong(0)).toSet == expected)
    // expiry now reclaims the superseded DATA and DELETE files
    val oldData = new java.io.File(dir, "data").listFiles().map(_.getName).toSet
    val deleted = IcebergWriter.expireSnapshots(dir, keepLast = 1)
    assert(deleted.exists(_.contains("/data/")),
      s"rewrite made old data files unreachable — expiry must reclaim them: $deleted")
    assert(deleted.exists(_.contains("posdel")), "the delete file dies too")
    assert(ks == expected, "reads survive the reclaim")
    val newData = new java.io.File(dir, "data").listFiles().map(_.getName).toSet
    assert(newData.subsetOf(oldData) && newData.size < oldData.size)
  }

  test("snapshot expiry deletes only unreachable files; current reads survive") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_expire").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir, Seq((1L, "A", 1)).toDF("k", "p", "v"), Some("p"))
    IcebergWriter.append(spark, dir, Seq((2L, "B", 2)).toDF("k", "p", "v"), Some("p"))
    IcebergWriter.upsert(spark, dir, Seq((1L, "A", 11)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = Some("p"))
    val before = IcebergLite.readSnapshot(spark, dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val deleted = IcebergWriter.expireSnapshots(dir, keepLast = 2)
    // snapshot 1000's manifest list is gone, but every data file it
    // added is still reachable from the kept snapshots — so only the
    // manifest list itself dies here
    assert(deleted.nonEmpty && deleted.forall(_.contains("metadata/")),
      s"commit-1 data is still live in later snapshots: $deleted")
    deleted.foreach(p => assert(!new java.io.File(p).exists()))
    val after = IcebergLite.readSnapshot(spark, dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after == before && after == Set((1L, 11), (2L, 2)))
    // the expired snapshot is gone from the log: loud failure
    intercept[IllegalArgumentException] {
      IcebergLite.readSnapshot(spark, dir, Some(1000L)).collect()
    }
    // expiring down to 1 snapshot also reclaims the replaced data file:
    // the upsert's equality delete hides k=1's old row only LOGICALLY;
    // once its snapshot is the only survivor, nothing else references
    // the old file... except iceberg semantics: the old data file is
    // still part of the current snapshot's plan (the delete is applied
    // at read). So nothing data-sized may be deleted here either.
    val deleted2 = IcebergWriter.expireSnapshots(dir, keepLast = 1)
    assert(deleted2.forall(_.contains("metadata/")),
      s"current-snapshot files must survive: $deleted2")
    val after2 = IcebergLite.readSnapshot(spark, dir)
      .select("k", "v").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(after2 == before)
  }

  test("concurrent append/append: loser retries, both snapshots land") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_concurrent").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      Seq((1L, "A", 1)).toDF("k", "p", "v"), partCol = Some("p"))
    // writer B commits BETWEEN writer A's metadata resolution and A's
    // CAS publish — the deterministic interleaving of the spec's
    // "Commit conflicts" scenario. A must lose v2, re-resolve against
    // B's snapshot, and land at v3 with B's manifests carried forward.
    IcebergWriter.appendHooked(spark, dir,
      Seq((2L, "A", 2)).toDF("k", "p", "v"), partCol = Some("p"),
      beforePublish = () => {
        IcebergWriter.append(spark, dir,
          Seq((3L, "B", 3)).toDF("k", "p", "v"), partCol = Some("p"))
        ()
      })
    assert(IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L),
      "no lost update: both concurrent commits are visible")
    val metaDir = new java.io.File(dir, "metadata")
    assert((1 to 3).forall(v =>
      new java.io.File(metaDir, s"v$v.metadata.json").exists()),
      "three metadata versions: base, winner, retried loser")
    assert(java.nio.file.Files.readString(
      metaDir.toPath.resolve("version-hint.text")).trim == "3")
    // the retried commit re-stamped its sequence number past the winner
    val tasks = IcebergLite.planFiles(dir)
    assert(tasks.map(_.sequenceNumber).toSet == Set(1L, 2L, 3L),
      s"each commit owns one sequence: $tasks")
  }

  test("concurrent append/delete: append retries over the delete commit") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_concdel").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      (1L to 6L).map(k => (k, "A", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    IcebergWriter.appendHooked(spark, dir,
      Seq((10L, "A", 10)).toDF("k", "p", "v"), partCol = Some("p"),
      beforePublish = () => {
        IcebergWriter.deleteRows(spark, dir, col("k") % 2 === 0)
        ()
      })
    assert(IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L, 5L, 10L),
      "delete applies to the base files; the retried append survives " +
        "(its file is not referenced by the position deletes)")
  }

  test("filesPerPart splits a hot partition across files; read is exact") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_split").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    // one hot partition value: strict one-file-per-value would funnel
    // all 2000 rows through one task
    IcebergWriter.append(spark, dir,
      (1L to 2000L).map(k => (k, "HOT", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"), filesPerPart = 4)
    val files = IcebergLite.planFiles(dir).filter(_.content == 0)
    assert(files.size > 1 && files.size <= 4,
      s"hot partition must split across up to 4 files: ${files.size}")
    assert(files.forall(_.partValue.contains("HOT")))
    assert(files.map(_.recordCount).sum == 2000L,
      "manifest record counts cover every row exactly once")
    assert(IcebergLite.readSnapshot(spark, dir)
      .agg(count(lit(1)), sum(col("k"))).collect().head.toSeq ==
      Seq(2000L, (1L to 2000L).sum))
  }

  test("tags pin snapshots through expiry; dropped tags become reapable") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/iceberg/writer_spec_refs").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val s1 = IcebergWriter.append(spark, dir, Seq((1L, "A", 1)).toDF("k", "p", "v"), Some("p"))
    IcebergWriter.append(spark, dir, Seq((2L, "A", 2)).toDF("k", "p", "v"), Some("p"))
    IcebergWriter.append(spark, dir, Seq((3L, "B", 3)).toDF("k", "p", "v"), Some("p"))
    IcebergWriter.tagSnapshot(dir, "train_v1", s1)
    assert(IcebergWriter.resolveRef(dir, "train_v1") == s1)
    // expiry keeps the tagged snapshot alive
    IcebergWriter.expireSnapshots(dir, keepLast = 1)
    val viaTag = IcebergLite.readSnapshot(spark, dir,
      Some(IcebergWriter.resolveRef(dir, "train_v1")))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(viaTag == Set(1L), "the tagged snapshot still reads exactly")
    assert(IcebergLite.readSnapshot(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    // drop the tag: the next expiry reaps it
    IcebergWriter.dropRef(dir, "train_v1")
    IcebergWriter.expireSnapshots(dir, keepLast = 1)
    intercept[IllegalArgumentException] {
      IcebergLite.readSnapshot(spark, dir, Some(s1)).collect()
    }
    intercept[IllegalArgumentException] {
      IcebergWriter.resolveRef(dir, "train_v1")
    }
  }

  test("bucket[N] write: spec hash stamps partitions, key-equality prunes files") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.IcebergLite
    val dir = new java.io.File("target/iceberg/writer_spec_bucket").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val rows = (1L to 64L).map(k => (k, s"v$k")).toDF("k", "v")
    IcebergWriter.append(spark, dir, rows, partCol = Some("k"),
      partTransform = "bucket[4]")
    // the stored partition values ARE the spec buckets
    val tasks = IcebergLite.planFiles(dir).filter(_.content == 0)
    assert(tasks.flatMap(_.partValue).toSet.subsetOf(
      (0 until 4).map(_.toString).toSet))
    assert(tasks.size == 4, s"64 keys over bucket[4] → 4 files: ${tasks.size}")
    // key-equality prune: only the key's bucket file is planned
    val key = 34L
    val want = IcebergLite.bucketLong(key, 4).toString
    val planned = IcebergLite.planFiles(dir,
      transformPrune = Some(("k", "bucket[4]", (pv: String) => pv == want)))
      .filter(_.content == 0)
    assert(planned.size == 1 && planned.head.partValue.contains(want))
    val got = IcebergLite.readSnapshot(spark, dir,
      transformPrune = Some(("k", "bucket[4]", (pv: String) => pv == want)))
      .filter($"k" === key).select("v").collect().map(_.getString(0)).toSeq
    assert(got == Seq("v34"))
    // a DIFFERENT transform's predicate must not prune these files
    assert(IcebergLite.planFiles(dir,
      transformPrune = Some(("k", "bucket[8]", (_: String) => false)))
      .count(_.content == 0) == 4, "other specs are conservatively kept")
    // data files retain the source column (the transform only names
    // the partition)
    assert(spark.read.parquet(tasks.head.path).columns.contains("k"))
  }

  test("truncate[W] and day transforms stamp spec-shaped partition values") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.IcebergLite
    val dir = new java.io.File("target/iceberg/writer_spec_trunc").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.append(spark, dir,
      Seq((7L, "a"), (12L, "b"), (19L, "c"), (23L, "d")).toDF("k", "v"),
      partCol = Some("k"), partTransform = "truncate[10]")
    val parts = IcebergLite.planFiles(dir).filter(_.content == 0)
      .flatMap(_.partValue).toSet
    assert(parts == Set("0", "10", "20"), s"width-10 floors: $parts")
    val pruned = IcebergLite.readSnapshot(spark, dir,
      transformPrune = Some(("k", "truncate[10]", (pv: String) => pv == "10")))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(pruned == Set(12L, 19L))
    val dir2 = new java.io.File("target/iceberg/writer_spec_day").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir2))
    IcebergWriter.append(spark, dir2,
      Seq(("2024-03-01 10:00:00", 1), ("2024-03-01 23:59:00", 2),
          ("2024-03-02 00:01:00", 3))
        .toDF("ts", "v").withColumn("ts", $"ts".cast("timestamp")),
      partCol = Some("ts"), partTransform = "day")
    val dayParts = IcebergLite.planFiles(dir2).filter(_.content == 0)
      .flatMap(_.partValue).toSet
    assert(dayParts == Set("2024-03-01", "2024-03-02"))
    val d2 = IcebergLite.readSnapshot(spark, dir2,
      transformPrune = Some(("ts", "day", (pv: String) => pv == "2024-03-02")))
      .select("v").collect().map(_.getInt(0)).toSet
    assert(d2 == Set(3))
  }

  test("multi-field spec: either field's component prunes; specs evolve") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.IcebergLite
    val dir = new java.io.File("target/iceberg/writer_spec_multi").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    IcebergWriter.appendMultiSpec(spark, dir,
      Seq(("2024-03-01 10:00:00", 1L, 10), ("2024-03-01 23:59:00", 2L, 20),
          ("2024-03-02 00:01:00", 3L, 30), ("2024-03-02 08:00:00", 4L, 40))
        .toDF("ts", "k", "v").withColumn("ts", $"ts".cast("timestamp")),
      Seq(("ts", "day"), ("k", "bucket[4]")))
    // stored tuples: day component + spec-murmur3 bucket component
    val parts = IcebergLite.planFiles(dir).filter(_.content == 0)
      .flatMap(_.partValue).toSet
    assert(parts.forall(_.split('\u0001').length == 2), s"tuples: $parts")
    assert(parts.map(_.split('\u0001')(0)) ==
      Set("2024-03-01", "2024-03-02"), s"day components: $parts")
    // day-component prune
    val d2 = IcebergLite.readSnapshot(spark, dir,
      transformPrune = Some(("ts", "day", (pv: String) => pv == "2024-03-02")))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(d2 == Set(3L, 4L))
    // bucket-component prune: k=1's spec bucket
    val b1 = IcebergLite.bucketLong(1L, 4).toString
    val k1 = IcebergLite.readSnapshot(spark, dir,
      transformPrune = Some(("k", "bucket[4]", (pv: String) => pv == b1)))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(k1.contains(1L))
    // PARTITION EVOLUTION interop: a later single-field append registers
    // a NEW spec; pruning on the multi spec keeps the new spec's files
    IcebergWriter.append(spark, dir,
      Seq(("2024-03-03 01:00:00", 9L, 90)).toDF("ts", "k", "v")
        .withColumn("ts", $"ts".cast("timestamp")),
      partCol = Some("k"), partTransform = "identity")
    val afterEvo = IcebergLite.readSnapshot(spark, dir,
      transformPrune = Some(("ts", "day", (pv: String) => pv == "2024-03-02")))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(afterEvo == Set(3L, 4L, 9L),
      "files under a spec without the field are conservatively kept")
  }

  test("empty append is rejected loudly, table state unchanged") {
    val s2 = spark
    import s2.implicits._
    val before = java.nio.file.Files.readString(java.nio.file.Paths.get(
      tableDir, "metadata", "version-hint.text")).trim
    intercept[IllegalArgumentException] {
      IcebergWriter.append(spark, tableDir,
        Seq.empty[(Long, String, Int)].toDF("k", "p", "v"), partCol = Some("p"))
    }
    val after = java.nio.file.Files.readString(java.nio.file.Paths.get(
      tableDir, "metadata", "version-hint.text")).trim
    assert(before == after, "a failed commit must not move the version hint")
  }
}
