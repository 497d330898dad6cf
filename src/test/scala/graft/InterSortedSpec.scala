package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 minhash-verify kernel pair (BandSigsExpr):
  * graft_sort_longs (ascending long-array sort) and graft_inter_sorted
  * (distinct-common-value count via merge walk) against the builtin
  * spelling size(array_intersect(a, b)) they replaced — including
  * duplicates, empties, and negative longs. */
class InterSortedSpec extends AnyFunSuite {
  import TestSpark._

  test("inter_sorted over sorted inputs equals size(array_intersect)") {
    val s2 = spark
    import s2.implicits._
    val rnd = new scala.util.Random(7)
    val cases = Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L), Seq(5L)),
      (Seq(-3L, 0L, 3L), Seq(0L, 3L, 9L)),
      (Seq(1L, 1L, 2L, 2L, 3L), Seq(2L, 2L, 3L, 3L, 4L)), // duplicates count once
      (Seq(Long.MinValue, -1L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))
    ) ++ (1 to 40).map { _ =>
      val a = Seq.fill(rnd.nextInt(50))(rnd.nextInt(30).toLong - 5)
      val b = Seq.fill(rnd.nextInt(50))(rnd.nextInt(30).toLong - 5)
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(
        expr("graft_inter_sorted(graft_sort_longs(a), graft_sort_longs(b))")
          .as("kernel"),
        size(array_intersect(col("a"), col("b"))).as("builtin"),
        expr("graft_sort_longs(a)").as("sa"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"kernel ${r.getInt(0)} != array_intersect ${r.getInt(1)}")
      val sa = r.getSeq[Long](2)
      assert(sa == sa.sorted, "graft_sort_longs must sort ascending")
    }
  }
}
