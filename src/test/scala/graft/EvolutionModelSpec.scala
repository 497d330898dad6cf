package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DeltaLite, DeltaWriter, HudiLite, IcebergLite, IcebergWriter, PaimonLite, PaimonWriter}

/** Differential test for ADD COLUMN evolution under MIXED histories:
  * each format runs seed → ADD COLUMN → writes carrying the new
  * column → updates → row deletes → MAINTENANCE (optimize / rewrite /
  * compaction) → EXPIRY, with an in-memory model of
  * key → (v, Option[w]) checked after every step. The interactions
  * this pins are the ones single-purpose fixtures miss: a compaction
  * that rewrites pre-evolution files must keep their NULLs, an
  * optimize after evolution must not resurrect dropped rows, expiry
  * must not reap the schema declaration. */
class EvolutionModelSpec extends AnyFunSuite {
  import TestSpark._

  private def partOf(k: Long): String = s"P${k % 2}"

  private def dfOld(rows: Seq[(Long, Int)]) = {
    val s2 = spark
    import s2.implicits._
    rows.map { case (k, v) => (k, partOf(k), v) }.toDF("k", "p", "v")
  }

  private def dfNew(rows: Seq[(Long, Int, Long)]) = {
    val s2 = spark
    import s2.implicits._
    rows.map { case (k, v, w) => (k, partOf(k), v, w) }.toDF("k", "p", "v", "w")
  }

  private type Model = Map[Long, (Int, Option[Long])]

  private def assertModel(got: Seq[(Long, Int, Option[Long])], model: Model,
                          op: String): Unit =
    assert(got.map(t => t._1 -> ((t._2, t._3))).toMap == model,
      s"diverged after $op")

  private def collect3(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v", "w").collect().map(r =>
      (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq

  test("iceberg: evolution mid-history with rewrite and expiry") {
    val dir = new java.io.File("target/iceberg/evo_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    var model: Model = Map(1L -> ((10, None)), 2L -> ((20, None)),
      3L -> ((30, None)), 4L -> ((40, None)))
    IcebergWriter.append(spark, dir,
      dfOld(Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))), Some("p"))
    def check(op: String): Unit =
      assertModel(collect3(IcebergLite.readSnapshot(spark, dir)), model, op)
    IcebergWriter.addColumn(spark, dir, "w", "BIGINT")
    check("addColumn")
    model ++= Map(5L -> ((50, Some(500L))), 6L -> ((60, Some(600L))))
    IcebergWriter.append(spark, dir,
      dfNew(Seq((5L, 50, 500L), (6L, 60, 600L))), Some("p"))
    check("append with w")
    // upsert updates an OLD key with a w value and an evolved key's v
    model ++= Map(2L -> ((22, Some(222L))), 5L -> ((55, Some(555L))))
    IcebergWriter.upsert(spark, dir,
      dfNew(Seq((2L, 22, 222L), (5L, 55, 555L))), Seq("k"), Some("p"))
    check("upsert across evolution")
    model -= 3L
    IcebergWriter.deleteRows(spark, dir, col("k") === 3L)
    check("delete")
    IcebergWriter.rewriteDataFiles(spark, dir, Some("p"))
    check("rewrite after evolution")
    IcebergWriter.expireSnapshots(dir, keepLast = 1)
    check("expiry keeps the declared schema")
  }

  test("delta: evolution mid-history with optimize and vacuum") {
    val dir = new java.io.File("target/delta/evo_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    var model: Model = Map(1L -> ((10, None)), 2L -> ((20, None)),
      3L -> ((30, None)), 4L -> ((40, None)))
    DeltaWriter.append(spark, dir,
      dfOld(Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))), Some("p"))
    def check(op: String): Unit =
      assertModel(collect3(DeltaLite.readVersion(spark, dir)), model, op)
    DeltaWriter.addColumn(spark, dir, "w", "BIGINT")
    check("addColumn")
    model ++= Map(5L -> ((50, Some(500L))), 6L -> ((60, Some(600L))))
    DeltaWriter.append(spark, dir,
      dfNew(Seq((5L, 50, 500L), (6L, 60, 600L))), Some("p"))
    check("append with w")
    model -= 2L
    DeltaWriter.deleteRows(spark, dir, col("k") === 2L)
    check("dv delete across evolution")
    DeltaWriter.optimize(spark, dir, Some("p"))
    check("optimize after evolution")
    // the time-travel boundary: a pre-evolution version reads under
    // ITS OWN schema (no w column — the declared schema is
    // version-scoped, exactly Delta's schema-as-of semantics)...
    assert(!DeltaLite.readVersion(spark, dir, Some(0L)).columns.contains("w"))
    DeltaWriter.vacuum(spark, dir, graceMillis = 0L)
    check("vacuum")
    // ...and after vacuum reclaims the superseded files, travel to them
    // fails LOUDLY — the documented Delta trade-off
    intercept[Exception] {
      DeltaLite.readVersion(spark, dir, Some(0L)).collect()
    }
  }

  test("hudi: evolution mid-history with compaction and clean") {
    val dir = new java.io.File("target/hudi/evo_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    var model: Model = Map(1L -> ((10, None)), 2L -> ((20, None)),
      3L -> ((30, None)), 4L -> ((40, None)))
    HudiLite.createTable(spark, dir,
      dfOld(Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))),
      Seq("k"), "p", "001", groupsPerPart = 2)
    def check(op: String): Unit =
      assertModel(collect3(HudiLite.readSnapshotMor(spark, dir, Seq("k"))),
        model, op)
    HudiLite.addColumn(spark, dir, "w", "BIGINT") // lands instant 002 (r16)
    check("addColumn")
    model ++= Map(2L -> ((22, Some(222L))), 6L -> ((60, Some(600L))))
    HudiLite.upsert(spark, dir,
      dfNew(Seq((2L, 22, 222L), (6L, 60, 600L))), Seq("k"), "p", "003"): Unit
    check("upsert with w")
    model -= 3L
    val s2 = spark
    import s2.implicits._
    HudiLite.deleteKeys(spark, dir, Seq(3L).toDF("k"), Seq("k"), "004")
    check("delete across evolution")
    HudiLite.compact(spark, dir, Seq("k"), "005")
    check("compaction folds the evolved column")
    HudiLite.clean(dir)
    check("clean")
  }

  test("paimon: evolution mid-history with expiry") {
    val dir = new java.io.File("target/paimon/evo_spec").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val s2 = spark
    import s2.implicits._
    var model: Model = Map(1L -> ((10, None)), 2L -> ((20, None)),
      3L -> ((30, None)), 4L -> ((40, None)))
    val keys = Seq("p", "k")
    PaimonWriter.append(spark, dir,
      dfOld(Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40))), "p", keys): Unit
    def check(op: String): Unit =
      assertModel(collect3(PaimonLite.readSnapshot(spark, dir, keys)), model, op)
    PaimonWriter.addColumn(spark, dir, "w", "BIGINT")
    check("addColumn")
    model ++= Map(2L -> ((22, Some(222L))), 6L -> ((60, Some(600L))))
    PaimonWriter.append(spark, dir,
      dfNew(Seq((2L, 22, 222L), (6L, 60, 600L))), "p", keys): Unit
    check("LSM upsert with w")
    model -= 3L
    PaimonWriter.append(spark, dir,
      Seq((3L, partOf(3L), 0, 0L, PaimonLite.KindDelete))
        .toDF("k", "p", "v", "w", "_VALUE_KIND"), "p", keys): Unit
    check("-D across evolution")
    PaimonWriter.expireSnapshots(dir, keepLast = 1)
    check("expiry keeps the schema files")
  }

  test("widen mid-history: narrow files, log blocks and maintenance agree") {
    val s2 = spark
    import s2.implicits._
    def dfI(rows: Seq[(Long, Int)]) =
      rows.map { case (k, v) => (k, partOf(k), v) }.toDF("k", "p", "v")
    def dfL(rows: Seq[(Long, Long)]) =
      rows.map { case (k, v) => (k, partOf(k), v) }.toDF("k", "p", "v")
    val BIG = 5000000000L // only BIGINT holds it

    // iceberg (positional): widen → BIG append → delete → rewrite
    locally {
      val dir = new java.io.File("target/iceberg/widen_spec").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      var model = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
      IcebergWriter.append(spark, dir, dfI(Seq((1L, 10), (2L, 20), (3L, 30))),
        Some("p"))
      IcebergWriter.widenColumn(spark, dir, "v", "BIGINT")
      def got() = IcebergLite.readSnapshot(spark, dir).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got() == model, "iceberg: widened read of narrow files")
      model += 9L -> BIG
      IcebergWriter.append(spark, dir, dfL(Seq((9L, BIG))), Some("p"))
      assert(got() == model, "iceberg: BIG append")
      model -= 2L
      IcebergWriter.deleteRows(spark, dir, col("k") === 2L)
      assert(got() == model, "iceberg: delete across widen")
      IcebergWriter.rewriteDataFiles(spark, dir, Some("p"))
      assert(got() == model, "iceberg: rewrite after widen")
    }
    // delta: widen → BIG append → DV delete → optimize → vacuum
    locally {
      val dir = new java.io.File("target/delta/widen_spec").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      var model = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
      DeltaWriter.append(spark, dir, dfI(Seq((1L, 10), (2L, 20), (3L, 30))),
        Some("p"))
      DeltaWriter.widenColumn(spark, dir, "v", "BIGINT")
      def got() = DeltaLite.readVersion(spark, dir).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got() == model, "delta: widened read of narrow files")
      model += 9L -> BIG
      DeltaWriter.append(spark, dir, dfL(Seq((9L, BIG))), Some("p"))
      assert(got() == model, "delta: BIG append")
      model -= 2L
      DeltaWriter.deleteRows(spark, dir, col("k") === 2L)
      assert(got() == model, "delta: DV delete across widen")
      DeltaWriter.optimize(spark, dir, Some("p"))
      assert(got() == model, "delta: optimize after widen")
      DeltaWriter.vacuum(spark, dir, graceMillis = 0L)
      assert(got() == model, "delta: vacuum after widen")
    }
    // hudi MoR: NARROW log blocks before the widen (decode coercion),
    // BIG log blocks after, compaction folds both
    locally {
      val dir = new java.io.File("target/hudi/widen_spec").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      var model = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
      HudiLite.createTable(spark, dir, dfI(Seq((1L, 10), (2L, 20), (3L, 30))),
        Seq("k"), "p", "001", groupsPerPart = 1)
      model += 2L -> 21L
      HudiLite.upsert(spark, dir, dfI(Seq((2L, 21))), Seq("k"), "p", "002"): Unit
      HudiLite.widenColumn(spark, dir, "v", "BIGINT") // lands instant 003 (r16)
      def got() = HudiLite.readSnapshotMor(spark, dir, Seq("k"))
        .select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got() == model, "hudi: widened read coerces narrow log blocks")
      model += 9L -> BIG
      HudiLite.upsert(spark, dir, dfL(Seq((9L, BIG))), Seq("k"), "p", "004"): Unit
      assert(got() == model, "hudi: BIG upsert")
      HudiLite.compact(spark, dir, Seq("k"), "005")
      assert(got() == model, "hudi: compaction folds narrow and wide blocks")
      HudiLite.clean(dir)
      assert(got() == model, "hudi: clean after widen")
    }
    // paimon LSM: widen → BIG upsert → -D delete → FULL COMPACTION →
    // expiry (compaction rewrites narrow+wide inputs as one wide file)
    locally {
      val dir = new java.io.File("target/paimon/widen_spec").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val keys = Seq("p", "k")
      var model = Map(1L -> 10L, 2L -> 20L, 3L -> 30L)
      PaimonWriter.append(spark, dir, dfI(Seq((1L, 10), (2L, 20), (3L, 30))),
        "p", keys): Unit
      PaimonWriter.widenColumn(spark, dir, "v", "BIGINT")
      def got() = PaimonLite.readSnapshot(spark, dir, keys).select("k", "v")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got() == model, "paimon: widened read of narrow files")
      model += 9L -> BIG
      PaimonWriter.append(spark, dir, dfL(Seq((9L, BIG))), "p", keys): Unit
      assert(got() == model, "paimon: BIG upsert")
      model -= 2L
      PaimonWriter.append(spark, dir,
        Seq((2L, partOf(2L), 0L, PaimonLite.KindDelete))
          .toDF("k", "p", "v", "_VALUE_KIND"), "p", keys): Unit
      assert(got() == model, "paimon: -D across widen")
      PaimonWriter.compact(spark, dir, keys, "p"): Unit
      assert(got() == model, "paimon: full compaction folds narrow+wide")
      PaimonWriter.expireSnapshots(dir, keepLast = 1)
      assert(got() == model, "paimon: expiry after widen+compaction")
    }
  }

  test("delta change feed across ADD COLUMN: mixed-schema windows null-fill") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/evo_cdf").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir, dfOld(Seq((1L, 10))), Some("p"))      // v0
    DeltaWriter.append(spark, dir, dfOld(Seq((2L, 20))), Some("p"))      // v1: old schema
    DeltaWriter.addColumn(spark, dir, "w", "BIGINT")                     // v2
    DeltaWriter.append(spark, dir, dfNew(Seq((3L, 30, 300L))), Some("p")) // v3: new schema
    // ONE window holding pre- AND post-evolution insert files: the feed
    // must plan the DECLARED schema — pre-evolution rows null-fill w,
    // post-evolution rows keep their values (not silently dropped)
    val feed = DeltaLite.readChanges(spark, dir, 0L, 3L)
    assert(feed.columns.contains("w"),
      s"feed must carry the evolved column: ${feed.columns.toSeq}")
    val got = feed.select("k", "w").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(2L -> None, 3L -> Some(300L)),
      s"mixed-schema window must null-fill, never drop: $got")
    // the same contract on the hudi incremental feed...
    locally {
      val hdir = new java.io.File("target/hudi/evo_cdf").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(hdir))
      HudiLite.createTable(spark, hdir, dfOld(Seq((1L, 10), (2L, 2))),
        Seq("k"), "p", "001")
      HudiLite.upsert(spark, hdir, dfOld(Seq((2L, 20))), Seq("k"), "p", "002"): Unit
      HudiLite.addColumn(spark, hdir, "w", "BIGINT") // lands instant 003 (r16)
      HudiLite.upsert(spark, hdir, dfNew(Seq((3L, 30, 300L))), Seq("k"), "p", "004"): Unit
      val hfeed = HudiLite.readIncrementalMor(spark, hdir, "001", "004")
      assert(hfeed.columns.contains("w"),
        s"hudi feed must carry the evolved column: ${hfeed.columns.toSeq}")
      val hgot = hfeed.select("k", "w").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(hgot == Map(2L -> None, 3L -> Some(300L)), s"hudi: $hgot")
    }
    // ...and the paimon changelog
    locally {
      val pdir = new java.io.File("target/paimon/evo_cdf").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pdir))
      val keys = Seq("p", "k")
      PaimonWriter.append(spark, pdir, dfOld(Seq((1L, 10))), "p", keys): Unit
      PaimonWriter.append(spark, pdir, dfOld(Seq((2L, 20))), "p", keys): Unit
      PaimonWriter.addColumn(spark, pdir, "w", "BIGINT") // snapshot 3 (r16)
      PaimonWriter.append(spark, pdir, dfNew(Seq((3L, 30, 300L))), "p", keys): Unit
      val pfeed = PaimonLite.readIncremental(spark, pdir, 1L, 4L)
      assert(pfeed.columns.contains("w"),
        s"paimon feed must carry the evolved column: ${pfeed.columns.toSeq}")
      val pgot = pfeed.select("k", "w").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(pgot == Map(2L -> None, 3L -> Some(300L)), s"paimon: $pgot")
    }
  }

  test("drop/rename mid-history: name mapping survives writes and maintenance") {
    val s2 = spark
    import s2.implicits._
    // iceberg: rename → write under new name → upsert (eq deletes) →
    // positional delete by the NEW name → rewrite → drop
    locally {
      val dir = new java.io.File("target/iceberg/evo_dr").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      IcebergWriter.append(spark, dir,
        dfOld(Seq((1L, 10), (2L, 20), (3L, 30))), Some("p"))
      IcebergWriter.renameColumn(spark, dir, "v", "vv")
      def got(): Map[Long, Int] = IcebergLite.readSnapshot(spark, dir)
        .select("k", "vv").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30), "rename reads old files")
      IcebergWriter.append(spark, dir,
        Seq((4L, partOf(4L), 40)).toDF("k", "p", "vv"), Some("p"))
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40),
        "post-rename append joins pre-rename files")
      IcebergWriter.upsert(spark, dir,
        Seq((2L, partOf(2L), 22)).toDF("k", "p", "vv"), Seq("k"), Some("p"))
      assert(got()(2L) == 22, "upsert across the rename")
      IcebergWriter.deleteRows(spark, dir, col("vv") === 30)
      assert(!got().contains(3L), "positional delete by the new name")
      IcebergWriter.rewriteDataFiles(spark, dir, Some("p"))
      assert(got() == Map(1L -> 10, 2L -> 22, 4L -> 40), "rewrite after rename")
      IcebergWriter.dropColumn(spark, dir, "vv")
      assert(!IcebergLite.readSnapshot(spark, dir).columns.contains("vv"))
      assert(IcebergLite.readSnapshot(spark, dir).count() == 3L)
    }
    // delta: rename upgrades to column mapping; DV delete + atomic
    // update + optimize all compose with it; then drop
    locally {
      val dir = new java.io.File("target/delta/evo_dr").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      DeltaWriter.append(spark, dir,
        dfOld(Seq((1L, 10), (2L, 20), (3L, 30))), Some("p"))
      DeltaWriter.renameColumn(spark, dir, "v", "vv")
      def got(): Map[Long, Int] = DeltaLite.readVersion(spark, dir)
        .select("k", "vv").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30), "rename reads old files")
      DeltaWriter.appendMapped(spark, dir,
        Seq((4L, partOf(4L), 40)).toDF("k", "p", "vv"), Some("p"))
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30, 4L -> 40),
        "post-rename append joins pre-rename files")
      // the change feed ships the LOGICAL schema over physical files
      val feed = DeltaLite.readChanges(spark, dir, 1L, 2L)
      assert(feed.columns.contains("vv") && !feed.columns.contains("v"),
        s"change feed must alias to logical names: ${feed.columns.toSeq}")
      assert(feed.filter(feed("_CHANGE_TYPE") === "insert")
        .select("vv").collect().map(_.getInt(0)).toSeq == Seq(40))
      DeltaWriter.deleteRows(spark, dir, col("vv") === 30)
      assert(!got().contains(3L), "DV delete by the new name")
      DeltaWriter.updateRows(spark, dir, _.filter(col("k") === 2L),
        Seq((2L, partOf(2L), 22)).toDF("k", "p", "vv"), Some("p"))
      assert(got()(2L) == 22, "atomic update across the mapping")
      DeltaWriter.optimize(spark, dir, Some("p"))
      assert(got() == Map(1L -> 10, 2L -> 22, 4L -> 40), "optimize after rename")
      DeltaWriter.dropColumn(spark, dir, "vv")
      assert(!DeltaLite.readVersion(spark, dir).columns.contains("vv"))
      assert(DeltaLite.readVersion(spark, dir).count() == 3L)
    }
    // hudi: rename → upsert logs under the write name → compaction
    // rewrites in write names → drop; re-adding a dropped name is loud
    locally {
      val dir = new java.io.File("target/hudi/evo_dr").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      HudiLite.createTable(spark, dir,
        dfOld(Seq((1L, 10), (2L, 20), (3L, 30))), Seq("k"), "p", "001")
      HudiLite.renameColumn(spark, dir, "v", "vv")
      def got(): Map[Long, Int] =
        HudiLite.readSnapshotMor(spark, dir, Seq("k"))
          .select("k", "vv").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30), "rename reads old files")
      HudiLite.upsert(spark, dir,
        Seq((2L, partOf(2L), 22), (4L, partOf(4L), 40)).toDF("k", "p", "vv"),
        Seq("k"), "p", "002"): Unit
      assert(got() == Map(1L -> 10, 2L -> 22, 3L -> 30, 4L -> 40),
        "upsert across the rename")
      HudiLite.compact(spark, dir, Seq("k"), "003")
      assert(got() == Map(1L -> 10, 2L -> 22, 3L -> 30, 4L -> 40),
        "compaction preserves the mapping")
      HudiLite.dropColumn(spark, dir, "vv")
      assert(!HudiLite.readSnapshotMor(spark, dir, Seq("k")).columns.contains("vv"))
      val e = intercept[Exception] {
        HudiLite.addColumn(spark, dir, "v", "INT")
      }
      assert(e.getMessage.contains("resurrect"),
        "re-adding a dropped write name must be loud")
    }
    // paimon: rename → LSM upsert under the new name → -D retraction →
    // expiry → drop
    locally {
      val dir = new java.io.File("target/paimon/evo_dr").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val keys = Seq("p", "k")
      PaimonWriter.append(spark, dir,
        dfOld(Seq((1L, 10), (2L, 20), (3L, 30))), "p", keys): Unit
      PaimonWriter.renameColumn(spark, dir, "v", "vv")
      def got(): Map[Long, Int] =
        PaimonLite.readSnapshot(spark, dir, keys)
          .select("k", "vv").collect()
          .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got() == Map(1L -> 10, 2L -> 20, 3L -> 30), "rename reads old files")
      PaimonWriter.append(spark, dir,
        Seq((2L, partOf(2L), 22), (4L, partOf(4L), 40)).toDF("k", "p", "vv"),
        "p", keys): Unit
      assert(got() == Map(1L -> 10, 2L -> 22, 3L -> 30, 4L -> 40),
        "LSM upsert across the rename")
      PaimonWriter.append(spark, dir,
        Seq((3L, partOf(3L), 0, PaimonLite.KindDelete))
          .toDF("k", "p", "vv", "_VALUE_KIND"), "p", keys): Unit
      assert(!got().contains(3L), "-D across the rename")
      PaimonWriter.expireSnapshots(dir, keepLast = 1)
      assert(got() == Map(1L -> 10, 2L -> 22, 4L -> 40), "expiry after rename")
      PaimonWriter.dropColumn(spark, dir, "vv")
      assert(!PaimonLite.readSnapshot(spark, dir, keys).columns.contains("vv"))
    }
  }

  test("retype mid-history: one-commit rewrite, travel, post-retype writes") {
    val s2 = spark
    import s2.implicits._
    // DELTA: the metaData + removes + adds share ONE version; time
    // travel to the pre-retype version still reads the integer type
    val ddir = new java.io.File("target/evo/retype_delta").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ddir))
    DeltaWriter.append(spark, ddir,
      dfOld(Seq((1L, 10), (2L, 20), (3L, 30))), Some("p")): Unit
    DeltaWriter.deleteRows(spark, ddir, col("k") === 2L): Unit // v1, a DV
    val vRt = DeltaWriter.retypeColumn(spark, ddir, "v", "string", Some("p"))
    assert(vRt == 2L, "retype must land exactly one version")
    val after = DeltaLite.readVersion(spark, ddir)
    assert(after.schema("v").dataType.simpleString == "string")
    assert(after.select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "10", 3L -> "30"),
      "the rewrite folds the DV state — deleted rows stay deleted")
    val before = DeltaLite.readVersion(spark, ddir, Some(1L))
    assert(before.schema("v").dataType.simpleString == "int",
      "travel to the pre-retype version reads the OLD type")
    // post-retype writes carry the new type; the feed stayed quiet
    // across the retype (dataChange=false, state motion)
    DeltaWriter.append(spark, ddir,
      Seq((4L, "P0", "40")).toDF("k", "p", "v"), Some("p")): Unit
    val feed = DeltaLite.readChanges(spark, ddir, 1L, 3L)
    assert(feed.filter(col("k").isin(1L, 3L)).count() == 0,
      "a retype rewrite is state motion — the feed must not re-ship rows")
    assert(feed.filter(col("_CHANGE_TYPE") === "insert")
      .select("k").collect().map(_.getLong(0)).toSet == Set(4L))

    // ICEBERG: the new schema entry and the replace-all snapshot share
    // ONE metadata swap; the CDC feed stays quiet across it
    val idir = new java.io.File("target/evo/retype_ice").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(idir))
    spark.sql("CREATE OR REPLACE TABLE graft_iceberg.evo_rt " +
      "(k BIGINT, p STRING, v INT) PARTITIONED BY (p)")
    val sqlDir = new java.io.File("target/lakehouse/iceberg/evo_rt")
      .getAbsolutePath
    spark.sql("INSERT INTO graft_iceberg.evo_rt " +
      "SELECT k, p, v FROM VALUES (1L, 'P0', 10), (2L, 'P1', 20) t(k, p, v)")
    val s1 = IcebergLite.currentSnapshotIdOf(sqlDir)
    spark.sql("ALTER TABLE graft_iceberg.evo_rt ALTER COLUMN v TYPE STRING")
    val got = spark.sql("SELECT k, v FROM graft_iceberg.evo_rt ORDER BY k")
    assert(got.schema("v").dataType.simpleString == "string")
    assert(got.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(1L -> "10", 2L -> "20"))
    val s2id = IcebergLite.currentSnapshotIdOf(sqlDir)
    val w = IcebergLite.readChangesCdc(spark, sqlDir, s1, s2id)
    assert(w.count() == 0,
      "an iceberg retype is one replace-stamped rewrite — feed-quiet")
    // r15: snapshots carry their schema-id, so travel ACROSS the retype
    // reads the OLD type (the Delta semantics above) instead of failing
    val preRt = spark.sql("SELECT k, v FROM graft_iceberg.evo_rt " +
      s"FOR VERSION AS OF $s1 ORDER BY k")
    assert(preRt.schema("v").dataType.simpleString == "int",
      "iceberg travel to the pre-retype snapshot reads the OLD type")
    assert(preRt.collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ==
      Seq(1L -> 10, 2L -> 20))

    // PAIMON (r15): pending schema + ONE COMPACT snapshot whose CAS is
    // the single visibility point; LSM state (upserts, tombstones)
    // folds into the rewrite; feeds stay quiet (COMPACT skip); the
    // retyped table keeps upserting
    val pdir = new java.io.File("target/lakehouse/paimon/evo_rt")
      .getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(pdir))
    Seq((1L, "P0", 10), (2L, "P1", 20), (3L, "P0", 30))
      .toDF("k", "p", "v").createOrReplaceTempView("evo_rt_p")
    spark.sql("CREATE OR REPLACE TABLE graft_paimon.evo_rt " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM evo_rt_p")
    spark.sql("INSERT INTO graft_paimon.evo_rt " +
      "SELECT 2 AS k, 'P1' AS p, 22 AS v") // LSM upsert
    spark.sql("DELETE FROM graft_paimon.evo_rt WHERE k = 3") // -D tombstone
    val pSnapsBefore = Option(new java.io.File(pdir, "snapshot").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("snapshot-"))
    spark.sql("ALTER TABLE graft_paimon.evo_rt ALTER COLUMN v TYPE STRING")
    val pSnapsAfter = Option(new java.io.File(pdir, "snapshot").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("snapshot-"))
    assert(pSnapsAfter == pSnapsBefore + 1,
      "paimon retype must land exactly ONE snapshot")
    val pGot = spark.sql("SELECT k, v FROM graft_paimon.evo_rt ORDER BY k")
    assert(pGot.schema("v").dataType.simpleString == "string")
    assert(pGot.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(1L -> "10", 2L -> "22"),
      "the rewrite folds LSM upserts and tombstones")
    // post-retype writes carry the new type
    spark.sql("INSERT INTO graft_paimon.evo_rt " +
      "SELECT 9 AS k, 'P0' AS p, '90' AS v")
    assert(spark.sql("SELECT v FROM graft_paimon.evo_rt WHERE k = 9")
      .head().getString(0) == "90")
    // travel ACROSS the retype reads the snapshot's OWN (old) type —
    // paimon snapshots stamp their schemaId and travel resolves it
    val pPre = spark.sql("SELECT k, v FROM graft_paimon.evo_rt " +
      s"FOR VERSION AS OF $pSnapsBefore ORDER BY k")
    assert(pPre.schema("v").dataType.simpleString == "int",
      "paimon travel to the pre-retype snapshot reads the OLD type")
    assert(pPre.collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ==
      Seq(1L -> 10, 2L -> 22))
    // the PENDING rule is what makes the CAS the visibility point: a
    // crash AFTER the schema write but BEFORE the snapshot (simulated
    // by hand-writing a marked schema file) leaves reads on the OLD
    // declared schema — never a string schema over integer files
    val schemaDir = new java.io.File(pdir, "schema")
    val maxId = schemaDir.listFiles().map(_.getName.stripPrefix("schema-").toLong).max
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(pdir, "schema", s"schema-${maxId + 1}"),
      s"""{"id":${maxId + 1},"activatesWithSnapshot":true,"fields":[
         |{"id":0,"name":"k","type":"BIGINT"},
         |{"id":1,"name":"p","type":"STRING"},
         |{"id":2,"name":"v","type":"DOUBLE"}]}""".stripMargin)
    assert(spark.sql("SELECT v FROM graft_paimon.evo_rt WHERE k = 9")
      .schema("v").dataType.simpleString == "string",
      "a pending (never-activated) schema must stay INERT for reads")
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(pdir, "schema", s"schema-${maxId + 1}"))

    // refusals stay loud: non-sanctioned retypes and rewrite-less formats
    assert(intercept[Exception] {
      spark.sql("ALTER TABLE graft_iceberg.evo_rt ALTER COLUMN k TYPE DOUBLE")
    }.getMessage.contains("sanctioned"))
    // HUDI (r15): the schema rides IN the commit — ONE replacecommit
    // carries the rewritten data and the overriding schema stamp;
    // logged (MoR) state folds into the rewrite; post-retype upserts
    // carry the new type
    Seq((1L, "A", 5), (2L, "A", 6)).toDF("k", "p", "v")
      .createOrReplaceTempView("evo_rt_h")
    spark.sql("CREATE OR REPLACE TABLE graft_hudi.evo_rt PRIMARY KEY (k) " +
      "PARTITIONED BY (p) AS SELECT * FROM evo_rt_h")
    spark.sql("INSERT INTO graft_hudi.evo_rt SELECT 2 AS k, 'A' AS p, 66 AS v")
    val hdir = new java.io.File("target/lakehouse/hudi/evo_rt")
    def hInstants: Int = Option(new java.io.File(hdir, ".hoodie").listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.endsWith(".commit") ||
        f.getName.endsWith(".deltacommit"))
    val hBefore = hInstants
    spark.sql("ALTER TABLE graft_hudi.evo_rt ALTER COLUMN v TYPE STRING")
    assert(hInstants == hBefore + 1,
      "hudi retype must land exactly ONE timeline instant")
    val hGot = spark.sql("SELECT k, v FROM graft_hudi.evo_rt ORDER BY k")
    assert(hGot.schema("v").dataType.simpleString == "string")
    assert(hGot.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(1L -> "5", 2L -> "66"),
      "the hudi rewrite folds the MoR log state")
    spark.sql("INSERT INTO graft_hudi.evo_rt SELECT 9 AS k, 'A' AS p, '90' AS v")
    assert(spark.sql("SELECT v FROM graft_hudi.evo_rt WHERE k = 9")
      .head().getString(0) == "90")
    // travel ACROSS the retype reads the pre-retype type — the schema
    // resolves AS OF the traveled instant (a later replace stamp must
    // not reshape old files)
    val hPre = spark.sql("SELECT k, v FROM graft_hudi.evo_rt " +
      "FOR VERSION AS OF 2 ORDER BY k")
    assert(hPre.schema("v").dataType.simpleString == "int",
      "hudi travel to the pre-retype instant reads the OLD type")
    assert(hPre.collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ==
      Seq(1L -> 5, 2L -> 66))
  }

  test("metadata-only ALTERs are travel points on paimon + hudi") {
    // r16: an ADD COLUMN / widen lands its own coordinate (paimon: an
    // empty SCHEMA snapshot stamped with the new schemaId; hudi: an
    // empty alterSchema commit instant), so travel can land BETWEEN a
    // data commit and the ALTER — and the ALTER coordinate itself
    // reads the evolved schema over the old files (null-fill/up-cast)

    // PAIMON
    spark.sql("CREATE OR REPLACE TABLE graft_paimon.evo_tp " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS " +
      "SELECT id AS k, 'A' AS p, CAST(id AS INT) AS v FROM range(1, 4)")
    spark.sql("ALTER TABLE graft_paimon.evo_tp ADD COLUMN w BIGINT") // snap 2
    spark.sql("INSERT INTO graft_paimon.evo_tp " +
      "SELECT 9 AS k, 'A' AS p, 90 AS v, 900L AS w")                 // snap 3
    val p1 = spark.sql(
      "SELECT * FROM graft_paimon.evo_tp FOR VERSION AS OF 1")
    assert(!p1.columns.contains("w"),
      "paimon travel BEFORE the ALTER must not see the added column")
    val p2 = spark.sql(
      "SELECT k, w FROM graft_paimon.evo_tp FOR VERSION AS OF 2 ORDER BY k")
    assert(p2.schema("w").dataType.simpleString == "bigint" &&
      p2.collect().forall(_.isNullAt(1)),
      "the paimon ALTER coordinate reads the evolved schema, null-filled")
    assert(p2.count() == 3, "the ALTER snapshot carries the same rows")
    // widen is a travel point too
    spark.sql("ALTER TABLE graft_paimon.evo_tp ALTER COLUMN v TYPE BIGINT")
    val p3 = spark.sql(
      "SELECT v FROM graft_paimon.evo_tp FOR VERSION AS OF 3")
    assert(p3.schema("v").dataType.simpleString == "int",
      "paimon travel between ALTERs reads the then-declared type")
    val p4 = spark.sql(
      "SELECT v FROM graft_paimon.evo_tp FOR VERSION AS OF 4")
    assert(p4.schema("v").dataType.simpleString == "bigint",
      "the paimon widen coordinate reads the widened type")

    // HUDI
    spark.sql("CREATE OR REPLACE TABLE graft_hudi.evo_tp PRIMARY KEY (k) " +
      "PARTITIONED BY (p) AS SELECT id AS k, 'A' AS p, CAST(id AS INT) AS v " +
      "FROM range(1, 4)")                                            // 001
    spark.sql("INSERT INTO graft_hudi.evo_tp SELECT 2 AS k, 'A' AS p, 22 AS v") // 002
    spark.sql("ALTER TABLE graft_hudi.evo_tp ADD COLUMN w BIGINT")   // 003
    spark.sql("INSERT INTO graft_hudi.evo_tp " +
      "SELECT 9 AS k, 'A' AS p, 90 AS v, 900L AS w")                 // 004
    val h2 = spark.sql(
      "SELECT * FROM graft_hudi.evo_tp FOR VERSION AS OF 2")
    assert(!h2.columns.contains("w"),
      "hudi travel BEFORE the ALTER must not see the added column")
    val h3 = spark.sql(
      "SELECT k, v, w FROM graft_hudi.evo_tp FOR VERSION AS OF 3 ORDER BY k")
    assert(h3.schema("w").dataType.simpleString == "bigint" &&
      h3.collect().forall(_.isNullAt(2)),
      "the hudi ALTER instant reads the evolved schema, null-filled")
    assert(h3.collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ==
      Seq(1L -> 1, 2L -> 22, 3L -> 3),
      "the ALTER instant carries the pre-ALTER state (002's upsert folded)")
    spark.sql("ALTER TABLE graft_hudi.evo_tp ALTER COLUMN v TYPE BIGINT") // 005
    val h4 = spark.sql(
      "SELECT v FROM graft_hudi.evo_tp FOR VERSION AS OF 4")
    assert(h4.schema("v").dataType.simpleString == "int",
      "hudi travel between ALTERs reads the then-declared type")
    val h5 = spark.sql(
      "SELECT v, w FROM graft_hudi.evo_tp FOR VERSION AS OF 5")
    assert(h5.schema("v").dataType.simpleString == "bigint",
      "the hudi widen instant reads the widened type")
    // the feed stays quiet across both ALTER coordinates
    val win = graft.ops.HudiLite.readIncrementalMor(spark,
      new java.io.File("target/lakehouse/hudi/evo_tp").getAbsolutePath,
      "004", "005", Seq("k"))
    assert(win.limit(1).count() == 0,
      "an ALTER instant's window must ship nothing")
  }

  test("digit-preserving decimal re-scale ×4: fold, log decimals, travel") {
    // DECIMAL(10,2) → DECIMAL(14,4): scale grows and the integer-digit
    // capacity is kept (total cast); a bare scale bump stays refused
    def bd(s: String) = new java.math.BigDecimal(s)
    for (fmt <- Seq("delta", "iceberg", "paimon", "hudi")) {
      val pk = fmt match {
        case "paimon" => "PRIMARY KEY (p, k) "
        case "hudi" => "PRIMARY KEY (k) "
        case _ => ""
      }
      spark.sql(s"CREATE OR REPLACE TABLE graft_$fmt.evo_dec $pk" +
        "PARTITIONED BY (p) AS SELECT id AS k, 'A' AS p, " +
        "CAST(id + 0.25 AS DECIMAL(10,2)) AS v FROM range(1, 6)")
      val isPk = fmt == "paimon" || fmt == "hudi"
      if (isPk)
        // a narrow (10,2) decimal lands LOG/LSM-borne before the retype
        spark.sql(s"INSERT INTO graft_$fmt.evo_dec " +
          "SELECT 2 AS k, 'A' AS p, CAST(22.50 AS DECIMAL(10,2)) AS v")
      val preVersions: Long = fmt match {
        case "paimon" => Option(new java.io.File(
            s"target/lakehouse/paimon/evo_dec/snapshot").listFiles())
          .getOrElse(Array.empty)
          .count(_.getName.startsWith("snapshot-")).toLong
        case "hudi" => Option(new java.io.File(
            s"target/lakehouse/hudi/evo_dec/.hoodie").listFiles())
          .getOrElse(Array.empty)
          .count(f => f.getName.endsWith(".commit") ||
            f.getName.endsWith(".deltacommit")).toLong
        case _ => -1L
      }
      spark.sql(s"ALTER TABLE graft_$fmt.evo_dec " +
        "ALTER COLUMN v TYPE DECIMAL(14,4)")
      // a bare scale bump (integer digits shrink) stays refused
      assert(intercept[Exception] {
        spark.sql(s"ALTER TABLE graft_$fmt.evo_dec " +
          "ALTER COLUMN v TYPE DECIMAL(14,6)")
      }.getMessage.contains("sanctioned"))
      // post-retype writes carry 4-dp values; on hudi the new key logs
      // a DECIMAL data block (the exact-string log codec)
      spark.sql(s"INSERT INTO graft_$fmt.evo_dec " +
        "SELECT 9 AS k, 'A' AS p, CAST(9.1234 AS DECIMAL(14,4)) AS v")
      if (isPk)
        // a post-retype UPSERT of an existing key: 4-dp log/LSM row
        // must win the merge over the rewritten base
        spark.sql(s"INSERT INTO graft_$fmt.evo_dec " +
          "SELECT 1 AS k, 'A' AS p, CAST(11.5678 AS DECIMAL(14,4)) AS v")
      val got = spark.sql(s"SELECT k, v FROM graft_$fmt.evo_dec ORDER BY k, v")
      assert(got.schema("v").dataType.simpleString == "decimal(14,4)",
        s"$fmt must read the re-scaled type")
      val expected: Seq[(Long, java.math.BigDecimal)] =
        if (isPk) Seq(1L -> bd("11.5678"), 2L -> bd("22.5000"),
          3L -> bd("3.2500"), 4L -> bd("4.2500"), 5L -> bd("5.2500"),
          9L -> bd("9.1234"))
        else Seq(1L -> bd("1.2500"), 2L -> bd("2.2500"), 3L -> bd("3.2500"),
          4L -> bd("4.2500"), 5L -> bd("5.2500"), 9L -> bd("9.1234"))
      assert(got.collect().map(r =>
          r.getLong(0) -> r.getDecimal(1)).toSeq == expected,
        s"$fmt decimal values must survive the re-scale exactly")
      // travel to the pre-retype coordinate reads the OLD (10,2) type
      // value-exact (paimon/hudi joined version-scoped travel in r15)
      if (preVersions >= 0) {
        val pre = spark.sql(s"SELECT k, v FROM graft_$fmt.evo_dec " +
          s"FOR VERSION AS OF $preVersions ORDER BY k")
        assert(pre.schema("v").dataType.simpleString == "decimal(10,2)",
          s"$fmt travel to the pre-retype coordinate reads the OLD scale")
        assert(pre.collect().map(r => r.getLong(0) -> r.getDecimal(1)).toSeq ==
          Seq(1L -> bd("1.25"), 2L -> bd("22.50"), 3L -> bd("3.25"),
            4L -> bd("4.25"), 5L -> bd("5.25")))
      }
    }
  }
}
