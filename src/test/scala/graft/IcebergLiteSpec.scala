package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.IcebergLite

/** ops/IcebergLite.scala — the spec-following Iceberg v2 read path:
  * snapshot visibility across the log, position-delete application,
  * pruning keeps delete files, and loud failure on unknown snapshots. */
class IcebergLiteSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir: String = {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
    val dir = new java.io.File("target/iceberg/spec_table").getAbsolutePath
    IcebergLite.writeFixtureTable(spark, dir, df,
      appends = Seq(
        Seq("A" -> Seq(Row(1L, "A", 10), Row(2L, "A", 20)),
            "B" -> Seq(Row(3L, "B", 30))),
        Seq("A" -> Seq(Row(4L, "A", 40)),
            "B" -> Seq(Row(5L, "B", 50), Row(6L, "B", 60)))),
      // delete: file 0 (s0_A) pos 1 -> k=2; file 3 (s1_B) pos 0 -> k=5
      deletes = Seq(0 -> Seq(1L), 3 -> Seq(0L)))
    dir
  }

  private def keys(snap: Option[Long], part: Option[String => Boolean] = None): Set[Long] =
    IcebergLite.readSnapshot(spark, tableDir, snap, part)
      .select(col("k")).collect().map(_.getLong(0)).toSet

  test("snapshot log visibility: each snapshot sees exactly its files") {
    assert(keys(Some(1000L)) == Set(1L, 2L, 3L), "first append")
    assert(keys(Some(1001L)) == Set(1L, 2L, 3L, 4L, 5L, 6L), "second append, pre-delete")
    assert(keys(None) == Set(1L, 3L, 4L, 6L), "current = deletes applied")
  }

  test("position deletes remove exactly the (file, pos) rows") {
    // k=2 was pos 1 of the first A file; k=5 pos 0 of the second B file
    val cur = keys(None)
    assert(!cur.contains(2L) && !cur.contains(5L))
    assert(cur.contains(1L) && cur.contains(6L),
      "neighbors of deleted positions must survive")
  }

  test("partition pruning narrows data files but keeps delete files") {
    val tasks = IcebergLite.planFiles(tableDir, None, Some(_ == "B"))
    assert(tasks.filter(_.content == 0).forall(_.partValue.contains("B")))
    assert(tasks.exists(_.content == 1),
      "delete files must survive partition pruning (they are partition-less)")
    assert(keys(None, Some(_ == "B")) == Set(3L, 6L))
  }

  test("column-stats pruning narrows by bounds, keeps bound-less files, composes with deletes") {
    // bounds on k: file0 A=[1,2], file1 B=[3,3], file2 A=[4,4], file3 B=[5,6]
    def kept(lo: Long, hi: Long) = IcebergLite.planFiles(tableDir,
      statsFilter = Some((l, u) =>
        l.get("k").forall(_ <= hi) && u.get("k").forall(_ >= lo)))
    val narrow = kept(5L, 6L)
    assert(narrow.count(_.content == 0) == 1,
      s"k in [5,6] should keep exactly the second B file: $narrow")
    assert(narrow.exists(_.content == 1),
      "delete files must survive stats pruning")
    // reading the pruned plan still applies deletes: k=5 is deleted
    val rows = IcebergLite.readSnapshot(spark, tableDir,
      statsFilter = Some((l, u) =>
        l.get("k").forall(_ <= 6L) && u.get("k").forall(_ >= 5L)))
      .select(col("k")).collect().map(_.getLong(0)).toSet
    assert(rows == Set(6L), s"delete inside the kept file must apply: $rows")
    // a filter on a column with no recorded bounds keeps everything
    val conservative = IcebergLite.planFiles(tableDir,
      statsFilter = Some((l, u) =>
        l.get("no_such_col").forall(_ <= 0L) && u.get("no_such_col").forall(_ >= 0L)))
    assert(conservative.count(_.content == 0) == 4,
      "missing bounds must be conservatively kept")
  }

  test("unknown snapshot id fails loudly") {
    val e = intercept[IllegalArgumentException] {
      IcebergLite.readSnapshot(spark, tableDir, Some(99L))
    }
    assert(e.getMessage.contains("snapshot 99"))
  }

  private lazy val upsertDir: String = {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val df = Seq((1L, "A", 10)).toDF("k", "p", "v")
    val dir = new java.io.File("target/iceberg/spec_upsert").getAbsolutePath
    IcebergLite.writeFixtureTable(spark, dir, df, Seq(
      IcebergLite.Append(Seq(
        "A" -> Seq(Row(1L, "A", 10), Row(2L, "A", 20), Row(3L, "A", 30)))),
      IcebergLite.EqDelete(Seq(Row(2L), Row(3L)),
        StructType(Seq(StructField("k", LongType)))),
      // re-insert k=3 AFTER the delete; also a position delete of k=1
      // (file 0 pos 0) composing with the equality delete
      IcebergLite.Append(Seq("A" -> Seq(Row(3L, "A", 31)))),
      IcebergLite.PosDelete(Seq(0 -> Seq(0L)))))
    dir
  }

  test("equality deletes: strict sequence rule keeps later re-inserts (upsert)") {
    def ks(snap: Option[Long]) =
      IcebergLite.readSnapshot(spark, upsertDir, snap)
        .select(col("k"), col("v")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(ks(Some(1000L)) == Set(1L -> 10, 2L -> 20, 3L -> 30), "pre-delete")
    assert(ks(Some(1001L)) == Set(1L -> 10), "after equality delete of k=2,3")
    assert(ks(Some(1002L)) == Set(1L -> 10, 3L -> 31),
      "re-inserted k=3 must survive the EARLIER equality delete (v=31, the new row)")
    assert(ks(None) == Set(3L -> 31),
      "final: position delete removes k=1; upserted k=3 remains")
  }

  test("bucket transform matches the published spec vector") {
    // Iceberg spec Appendix B: bucket hash of int/long 34 = 2017239379
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(34L).array()
    assert(graft.functions.Murmur3.hash32(b, 0) == 2017239379)
    assert(IcebergLite.bucketLong(34L, 16) == 2017239379 % 16)
    // positive-mod contract for keys whose hash is negative
    assert((0 until 64).forall(i => IcebergLite.bucketLong(i.toLong, 8) >= 0))
  }
}
