package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PaimonLite

/** ops/PaimonLite.scala — snapshot replay + LSM deduplicate-merge
  * semantics: upsert wins by sequence, delete drops the key, a later
  * re-insert survives the earlier delete, compaction (ADD merged +
  * DELETE old) leaves the snapshot content unchanged, incremental
  * reads skip COMPACT snapshots, unknown snapshots fail loudly. */
class PaimonLiteSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("p", StringType), StructField("k", LongType),
    StructField("v", IntegerType),
    StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
    StructField("_VALUE_KIND", IntegerType, nullable = false)))

  private def r(p: String, k: Long, v: Int, seq: Long, kind: Int) =
    Row(p, k, v, seq, kind)

  /** c1: +I k=1,2,3 (A), k=4 (B); c2: +U k=2 → 22, -D k=3;
    * c3: +I k=3 → 33 (re-insert AFTER the delete);
    * c4: COMPACT of A — merged level-5 file + DELETE entries for the
    * three old A files. */
  private lazy val tableDir: String = {
    val dir = new java.io.File("target/paimon/spec_table").getAbsolutePath
    val w1 = Seq(
      PaimonLite.Write(Some("A"), 0, 0, Seq(
        r("A", 1, 1, 10, PaimonLite.KindInsert),
        r("A", 2, 2, 11, PaimonLite.KindInsert),
        r("A", 3, 3, 12, PaimonLite.KindInsert))),
      PaimonLite.Write(Some("B"), 0, 0, Seq(
        r("B", 4, 4, 13, PaimonLite.KindInsert))))
    val w2 = Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
      r("A", 2, 22, 20, PaimonLite.KindUpdateAfter),
      r("A", 3, 3, 21, PaimonLite.KindDelete))))
    val w3 = Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
      r("A", 3, 33, 30, PaimonLite.KindInsert))))
    val mergedA = PaimonLite.mergeDriverLocal(
      w1.head.rows ++ w2.head.rows ++ w3.head.rows, schema, Seq("p", "k"))
      .sortBy(_.getLong(1))
    val w4 = Seq(PaimonLite.Write(Some("A"), 0, 5, mergedA))
    val removes = Seq(1, 2, 3).map(s => PaimonLite.FileMeta(
      s"A/bucket-0/data-s$s-0.parquet", Some("A"), 0, 0, 0L, 0L, 0L))
    PaimonLite.writeFixtureTable(spark, dir, schema, Seq(
      PaimonLite.Commit("APPEND", w1),
      PaimonLite.Commit("APPEND", w2),
      PaimonLite.Commit("APPEND", w3),
      PaimonLite.Commit("COMPACT", w4, removes)))
    dir
  }

  private def kv(snapshot: Option[Long]): Set[(Long, Int)] =
    PaimonLite.readSnapshot(spark, tableDir, Seq("p", "k"), snapshot)
      .select(col("k"), col("v")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet

  test("deduplicate merge: upsert wins, delete drops, re-insert survives") {
    assert(kv(Some(1L)) == Set(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4), "snap 1")
    assert(kv(Some(2L)) == Set(1L -> 1, 2L -> 22, 4L -> 4),
      "snap 2: k=2 upserted, k=3 deleted")
    assert(kv(Some(3L)) == Set(1L -> 1, 2L -> 22, 3L -> 33, 4L -> 4),
      "snap 3: k=3 re-inserted after its delete")
  }

  test("compaction replay leaves snapshot content unchanged") {
    assert(kv(Some(4L)) == kv(Some(3L)), "COMPACT must be a state no-op")
    // and it really did rewrite the file list: one level-5 A file now
    val files = PaimonLite.planFiles(tableDir,
      partFilter = Some(_ == "A"))
    assert(files.size == 1 && files.head.level == 5,
      s"expected the single merged level-5 file, got $files")
  }

  test("incremental read ships APPEND deltas and skips COMPACT") {
    val w12 = PaimonLite.readIncremental(spark, tableDir, 1L, 2L)
      .select(col("k"), col("_VALUE_KIND")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSet
    assert(w12 == Set(2L -> PaimonLite.KindUpdateAfter,
      3L -> PaimonLite.KindDelete), "snapshot 2's changelog")
    val w14 = PaimonLite.readIncremental(spark, tableDir, 1L, 4L)
      .select(col("k"), col("_VALUE_KIND")).collect()
      .map(x => (x.getLong(0), x.getInt(1))).toSeq.sorted
    assert(w14 == Seq(2L -> PaimonLite.KindUpdateAfter,
      3L -> PaimonLite.KindDelete, 3L -> PaimonLite.KindInsert).sorted,
      "window (1,4]: snapshots 2+3, COMPACT 4 skipped")
  }

  test("pruning plans only matching partitions; unknown snapshot is loud") {
    val files = PaimonLite.planFiles(tableDir, partFilter = Some(_ == "B"))
    assert(files.nonEmpty && files.forall(_.part.contains("B")))
    intercept[IllegalArgumentException] {
      PaimonLite.planFiles(tableDir, Some(99L))
    }
  }

  // ---- partial-update merge engine: column-sparse folds in seq order
  private val puSchema = StructType(Seq(
    StructField("p", StringType), StructField("k", LongType),
    StructField("a", IntegerType), StructField("b", StringType),
    StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
    StructField("_VALUE_KIND", IntegerType, nullable = false)))
  private def pu(k: Long, a: Any, b: String, seq: Long, kind: Int) =
    Row("A", k, a, b, seq, kind)

  private lazy val puTableDir: String = {
    val dir = new java.io.File("target/paimon/spec_pu_table").getAbsolutePath
    // k=1: insert (1,"x") then a-only update → (11,"x")
    // k=2: insert (2,"y"), b-only update → (2,"z"), then -D, then a
    //      re-created row with ONLY a set → (22,null): the delete must
    //      clear "z", not let it leak through the rebuild
    // k=3: delete wins last → absent
    PaimonLite.writeFixtureTable(spark, dir, puSchema, Seq(
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(1, 1, "x", 10, PaimonLite.KindInsert),
        pu(2, 2, "y", 11, PaimonLite.KindInsert),
        pu(3, 3, "w", 12, PaimonLite.KindInsert))))),
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(1, 11, null, 20, PaimonLite.KindUpdateAfter),
        pu(2, null, "z", 21, PaimonLite.KindUpdateAfter))))),
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(2, null, null, 30, PaimonLite.KindDelete),
        pu(3, null, null, 31, PaimonLite.KindDelete),
        pu(2, 22, null, 32, PaimonLite.KindUpdateAfter)))))))
    dir
  }

  test("partial-update merge: non-null overwrites, delete resets the fold") {
    val got = PaimonLite.readSnapshotPartialUpdate(spark, puTableDir, Seq("p", "k"))
      .select(col("k"), col("a"), col("b")).collect()
      .map(x => (x.getLong(0),
        if (x.isNullAt(1)) null else x.getInt(1),
        x.getString(2))).toSet
    assert(got == Set((1L, 11, "x"), (2L, 22, null)),
      s"k=1 keeps b through the a-update; k=2 rebuilt AFTER delete; k=3 gone: $got")
  }

  test("partial-update time travel folds only visible sequences") {
    val got = PaimonLite.readSnapshotPartialUpdate(spark, puTableDir,
        Seq("p", "k"), snapshotId = Some(2L))
      .select(col("k"), col("a"), col("b")).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).toSet
    assert(got == Set((1L, 11, "x"), (2L, 2, "z"), (3L, 3, "w")))
  }

  // ---- aggregation merge engine: per-column combine via TableModels
  test("aggregation merge combines per spec; retraction input is loud") {
    import graft.ops.TableModels
    val dir = new java.io.File("target/paimon/spec_agg_table").getAbsolutePath
    PaimonLite.writeFixtureTable(spark, dir, puSchema, Seq(
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(1, 5, "x", 10, PaimonLite.KindInsert),
        pu(1, 7, "y", 11, PaimonLite.KindInsert))))),
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(1, 3, null, 20, PaimonLite.KindUpdateAfter)))))))
    val got = PaimonLite.readSnapshotAggMerge(spark, dir, Seq("p", "k"),
        Seq("a" -> TableModels.Sum, "b" -> TableModels.ReplaceIfNotNull))
      .select(col("k"), col("a"), col("b")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSet
    assert(got == Set((1L, 15L, "y")),
      s"sum(5,7,3)=15; last non-null b by sequence is y: $got")
    // a retraction under the aggregation engine must fail loudly
    PaimonLite.writeFixtureTable(spark, dir, puSchema, Seq(
      PaimonLite.Commit("APPEND", Seq(PaimonLite.Write(Some("A"), 0, 0, Seq(
        pu(1, 5, "x", 10, PaimonLite.KindInsert),
        pu(1, 2, null, 11, PaimonLite.KindDelete)))))))
    intercept[Exception] {
      PaimonLite.readSnapshotAggMerge(spark, dir, Seq("p", "k"),
        Seq("a" -> TableModels.Sum, "b" -> TableModels.ReplaceIfNotNull))
        .collect()
    }
  }
}
