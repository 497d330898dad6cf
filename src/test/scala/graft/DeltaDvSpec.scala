package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DeltaDv, DeltaLite, DeltaWriter}

/** ops/DeltaDv.scala + the DV halves of DeltaLite/DeltaWriter: Z85
  * pinned to the published vector, portable roaring64 round trips
  * across container types and high buckets, DV-file framing with
  * checksums, and the end-to-end row-level delete — positions merge
  * across delete commits, parquet bytes never rewrite, checkpoints
  * carry descriptors. */
class DeltaDvSpec extends AnyFunSuite {
  import TestSpark._

  test("z85 round trip, pinned to the ZeroMQ spec's HelloWorld vector") {
    val hello = Array(0x86, 0x4f, 0xd2, 0x6f, 0xb5, 0x59, 0xf7, 0x5b)
      .map(_.toByte)
    assert(DeltaDv.z85Encode(hello) == "HelloWorld")
    assert(DeltaDv.z85Decode("HelloWorld").toSeq == hello.toSeq)
    val rnd = Array.tabulate(64)(i => ((i * 37 + 11) % 256).toByte)
    assert(DeltaDv.z85Decode(DeltaDv.z85Encode(rnd)).toSeq == rnd.toSeq)
  }

  test("portable roaring64 round trips arrays, bitmaps, and high buckets") {
    val small = Seq(0L, 1L, 5L, 65535L, 65536L, 1000000L)
    assert(DeltaDv.roaringDeserialize(DeltaDv.roaringSerialize(small)) == small)
    // > 4096 values in one 16-bit key → bitmap container
    val dense = (0L until 5000L).map(_ * 2)
    assert(DeltaDv.roaringDeserialize(DeltaDv.roaringSerialize(dense)) == dense)
    // values spanning multiple 32-bit high buckets
    val wide = Seq(3L, (1L << 32) + 7, (1L << 32) + 8, (5L << 32) + 123456789L)
    assert(DeltaDv.roaringDeserialize(DeltaDv.roaringSerialize(wide)) == wide)
  }

  test("DV file framing: offsets, sizes, checksum verification") {
    val path = new java.io.File("target/delta/dv_frame_test.bin").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    val b1 = DeltaDv.dvBlob(Seq(1L, 2L, 3L))
    val b2 = DeltaDv.dvBlob(Seq(10L, 20L))
    val frames = DeltaDv.writeDvFile(path, Seq(b1, b2))
    assert(frames.head._1 == 1, "first blob after the 1-byte version")
    assert(DeltaDv.readDvFile(path, frames(0)._1, frames(0)._2) == Seq(1L, 2L, 3L))
    assert(DeltaDv.readDvFile(path, frames(1)._1, frames(1)._2) == Seq(10L, 20L))
    // corrupt one payload byte: the checksum must catch it
    val raf = new java.io.RandomAccessFile(path, "rw")
    raf.seek(frames(1)._1 + 4 + 2)
    raf.writeByte(0x7f)
    raf.close()
    intercept[IllegalArgumentException] {
      DeltaDv.readDvFile(path, frames(1)._1, frames(1)._2)
    }
  }

  test("optimize purges deletion vectors into fresh DV-free files") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/dv_optimize").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 20L).map(k => (k, if (k % 2 == 0) "A" else "B", k.toInt)).toDF("k", "p", "v"),
      partCol = Some("p"))
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    val expected = (1L to 20L).filterNot(_ % 3 == 0).toSet
    val vOpt = DeltaWriter.optimize(spark, dir, partColIn = Some("p"))
    val plan = DeltaLite.planAddsWithCheckpoint(spark, dir)
    assert(plan.forall(_.dv.isEmpty), s"optimize must leave no DVs: $plan")
    assert(plan.forall(_.path.startsWith(s"data/o$vOpt")), "all files rewritten")
    assert(DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet == expected)
    // the pre-optimize DV version still time travels identically
    assert(DeltaLite.readVersion(spark, dir, Some(vOpt - 1))
      .select("k").collect().map(_.getLong(0)).toSet == expected)
  }

  test("row-level delete end to end: merge across commits, no rewrite, checkpoint") {
    val s2 = spark
    import s2.implicits._
    val dir = new java.io.File("target/delta/dv_table").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    DeltaWriter.append(spark, dir,
      (1L to 20L).map(k => (k, if (k % 2 == 0) "A" else "B", k * 10)).toDF("k", "p", "v"),
      partCol = Some("p"))
    val dataBytes = new java.io.File(dir, "data").listFiles()
      .map(f => f.getName -> f.length()).toMap
    def ks: Set[Long] = DeltaLite.readVersion(spark, dir)
      .select("k").collect().map(_.getLong(0)).toSet
    DeltaWriter.deleteRows(spark, dir, col("k") % 3 === 0)
    assert(ks == (1L to 20L).filterNot(_ % 3 == 0).toSet)
    DeltaWriter.deleteRows(spark, dir, col("k") % 5 === 0)
    assert(ks == (1L to 20L).filterNot(k => k % 3 == 0 || k % 5 == 0).toSet,
      "the second DV must merge with the first, not replace it")
    // no parquet rewrite happened
    val after = new java.io.File(dir, "data").listFiles()
      .map(f => f.getName -> f.length()).toMap
    assert(after == dataBytes, "row-level delete must not rewrite data files")
    // time travel to the pre-delete version still sees every row
    val v0 = DeltaLite.readVersion(spark, dir, Some(0L))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(v0 == (1L to 20L).toSet)
    // checkpoint carries the descriptors: expire the JSON log, re-read
    DeltaLite.writeCheckpoint(spark, dir, 2L)
    assert(DeltaLite.expireLog(dir, 2L).size == 3)
    assert(ks == (1L to 20L).filterNot(k => k % 3 == 0 || k % 5 == 0).toSet,
      "checkpointed DVs must survive log expiry")
  }
}
