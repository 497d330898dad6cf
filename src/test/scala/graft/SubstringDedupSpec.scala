package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

/** ops/Dedup.substringDedupSpans (Lee et al. '22 exact-substring span
  * dedup, relational re-expression) pinned against an independent
  * single-machine reimplementation: brute-force shingle multiset,
  * per-doc interval merge, literal string surgery. */
class SubstringDedupSpec extends AnyFunSuite {
  import TestSpark._

  private val W = 5

  private def naive(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long, String)] = {
    val words = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ws) <- words; p <- 0 to ws.length - W)
      counts.updateWith(ws.slice(p, p + W).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    docs.map { case (id, _) =>
      val ws = words(id)
      val dupPos = (0 to ws.length - W)
        .filter(p => counts(ws.slice(p, p + W).mkString(" ")) >= 2)
      // merge [p, p+W-1] intervals, sorted, equal length
      // merge on OVERLAP only (p <= prev end) — adjacent-but-touching
      // windows stay separate spans, matching the operator's
      // p > lag(p) + W - 1 break rule
      val spans = dupPos.foldLeft(Vector.empty[(Int, Int)]) { (acc, p) =>
        acc.lastOption match {
          case Some((s, e)) if p <= e => acc.init :+ (s, p + W - 1)
          case _ => acc :+ (p, p + W - 1)
        }
      }
      val covered = spans.map { case (s, e) => e - s + 1 }.sum
      val keep = ws.zipWithIndex.collect {
        case (x, i) if !spans.exists { case (s, e) => i >= s && i <= e } => x
      }
      id -> (ws.length.toLong, spans.size.toLong, dupPos.size.toLong,
        covered.toLong, (ws.length - covered).toLong, keep.mkString(" "))
    }.toMap
  }

  test("spans, counts, and removed text match the naive reimplementation") {
    val corpus = Tables.load(spark, sf, "documents")
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
    val got = Dedup.substringDedupSpans(corpus, "doc_id", "text", W)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getString(6))).toMap
    val docsLocal = corpus.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = naive(docsLocal)
    assert(got.keySet == want.keySet)
    var nWithSpans = 0
    for (id <- want.keySet.toSeq.sorted) {
      val (n, sp, dp, cov, kept, keptText) = want(id)
      val g = got(id)
      assert((g._1, g._2, g._3, g._4, g._5) == (n, sp, dp, cov, kept),
        s"doc $id stats mismatch: got $g want ${want(id)}")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(keptText.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(g._6 == md, s"doc $id kept-text fingerprint mismatch")
      if (sp > 0) nWithSpans += 1
    }
    assert(nWithSpans > 0, "fixture has no duplicated spans — test is vacuous")
  }

  test("degenerate docs: empty text and below-window text pass through") {
    val s2 = spark
    import s2.implicits._
    val tiny = Seq((1L, ""), (2L, "a b"), (3L, "a b"), (4L, "x y z w q r s t u"))
      .toDF("doc_id", "text")
    val out = Dedup.substringDedupSpans(tiny, "doc_id", "text", W)
      .orderBy("doc_id").collect()
    // docs 1-3 are shorter than the window: no shingles, nothing removed
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 0L) // "" splits to [""]
    assert(out(1).getLong(2) == 0L && out(2).getLong(2) == 0L)
    assert(out(3).getLong(2) == 0L) // 9 unique words, no duplicate shingle
  }
}
