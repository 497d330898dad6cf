package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HudiLite

/** ops/HudiLite.scala — copy-on-write file-slice semantics: latest
  * slice per file group wins, untouched groups keep older slices,
  * partition pruning during timeline replay, loud failures. */
class HudiLiteSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val tableDir: String = {
    val s2 = spark
    import s2.implicits._
    val df = Seq((1L, "A", 1)).toDF("k", "p", "v")
    val dir = new java.io.File("target/hudi/spec_table").getAbsolutePath
    HudiLite.writeFixtureTable(spark, dir, df, Seq(
      HudiLite.Commit("001", Seq(
        ("A", "g1", Seq(Row(1L, "A", 1), Row(2L, "A", 2))),
        ("B", "g2", Seq(Row(3L, "B", 3))))),
      HudiLite.Commit("002", Seq(
        ("A", "g1", Seq(Row(1L, "A", 11), Row(4L, "A", 4)))))))
    dir
  }

  private def ks(instant: Option[String]): Set[(Long, Int)] =
    HudiLite.readSnapshot(spark, tableDir, instant)
      .select(col("k"), col("v")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet

  test("latest slice per file group; untouched groups keep old slices") {
    assert(ks(Some("001")) == Set(1L -> 1, 2L -> 2, 3L -> 3), "instant 001")
    assert(ks(None) == Set(1L -> 11, 4L -> 4, 3L -> 3),
      "current: g1 rewritten (k=2 gone, k=1 updated, k=4 added), g2 untouched")
  }

  test("partition pruning during replay") {
    val files = HudiLite.planFiles(tableDir, None, Some(_ == "B"))
    assert(files.map(_._3) == Seq("g2"))
    assert(ks(None).size == 3) // pruning above didn't mutate state
  }

  test("an instant before the first commit fails loudly") {
    intercept[IllegalArgumentException] {
      HudiLite.planFiles(tableDir, Some("000"))
    }
  }
}
