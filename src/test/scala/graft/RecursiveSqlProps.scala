package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style fuzz of the WITH RECURSIVE pre-pass: random ladders
  * (random anchors, stride, bound, UNION flavor, optional column-list
  * spelling, whitespace/comment noise) are rendered as SQL text and
  * checked against the directly-computed fixpoint. Hunts parser bugs —
  * leg splitting, keyword scanning over noise, set-vs-bag dispatch —
  * that the hand-written spec shapes would miss. */
class RecursiveSqlProps extends AnyFunSuite {
  import TestSpark._

  private def expected(anchors: Seq[Long], stride: Long, bound: Long,
                       bag: Boolean): Seq[Long] = {
    // fixpoint of n -> n + stride applied while n < bound (guard on the
    // SOURCE row), starting from the anchors
    var acc = if (bag) anchors else anchors.distinct
    var delta = acc
    var continue = true
    while (continue) {
      val next0 = delta.filter(_ < bound).map(_ + stride)
      val next = if (bag) next0 else next0.distinct.diff(acc)
      if (next.isEmpty) continue = false
      else { acc = acc ++ next; delta = next }
    }
    acc.sorted
  }

  test("40 random ladders match the direct fixpoint (set and bag)") {
    val r = new scala.util.Random(4242)
    val bad = (1 to 40).flatMap { i =>
      val nAnchors = 1 + r.nextInt(3)
      val anchors = Seq.fill(nAnchors)(1L + r.nextInt(30))
      val stride = 1L + r.nextInt(9)
      val bound = 20L + r.nextInt(80)
      val bag = r.nextBoolean()
      val union = if (bag) "UNION ALL" else "UNION"
      val cols = r.nextBoolean() // (n) column list vs aliased anchor
      val noise = if (r.nextBoolean()) "\n        -- ladder comment\n" else " "
      val anchorSql = anchors
        .map(a => if (cols) s"SELECT CAST($a AS BIGINT)"
                  else s"SELECT CAST($a AS BIGINT) AS n")
        .mkString(s" $union ")
      val head = if (cols) "t(n)" else "t"
      val sql = s"""
        WITH RECURSIVE $head AS ($noise
          $anchorSql
          $union
          SELECT n + $stride FROM t WHERE n < $bound
        )
        SELECT n FROM t ORDER BY n"""
      val got = spark.sql(sql).collect().map(_.getLong(0)).toSeq
      val want = expected(anchors, stride, bound, bag)
      if (got == want) None
      else Some(s"case $i (anchors=$anchors stride=$stride bound=$bound " +
        s"bag=$bag): got ${got.take(8)}... want ${want.take(8)}...")
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
