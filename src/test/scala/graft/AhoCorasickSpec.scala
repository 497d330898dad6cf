package graft

import graft.ops.AhoCorasick
import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick automaton (ops/AhoCorasick.scala) vs a naive
  * indexOf-sweep reimplementation: distinct matches and full
  * occurrence counts (overlaps included) must agree on adversarial
  * pattern sets. */
class AhoCorasickSpec extends AnyFunSuite {

  private def naiveCount(text: String, p: String): Long = {
    var n = 0L
    var i = text.indexOf(p)
    while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) } // overlaps too
    n
  }

  private def naiveDistinct(text: String, pats: Seq[String]): Set[String] =
    pats.filter(text.contains).toSet

  test("nested and overlapping patterns report every end position") {
    val ac = new AhoCorasick(IndexedSeq("aa", "aaa", "scan", "table scan"))
    assert(ac.countMatches("aaaa") == 3 + 2) // "aa" x3 overlapping, "aaa" x2
    assert(ac.distinctMatches("big table scan here").map(ac.patterns) ==
      Set("scan", "table scan"))
    assert(ac.countMatches("table scan scan") == 3) // table scan, scan x2
  }

  test("agrees with the naive sweep on random word-soup") {
    val vocab = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch", "stream")
    val pats = IndexedSeq("table scan", "scan", "batch batch", "order sort",
      "t k", "w wi", "hash", "merge part", "sor", "an s")
    val ac = new AhoCorasick(pats)
    val r = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val text = Seq.fill(3 + r.nextInt(40))(vocab(r.nextInt(vocab.size)))
        .mkString(" ")
      assert(ac.distinctMatches(text).map(pats) == naiveDistinct(text, pats),
        s"distinct diverged on '$text'")
      assert(ac.countMatches(text) == pats.map(naiveCount(text, _)).sum,
        s"count diverged on '$text'")
    }
  }

  test("single-char, full-text, and absent patterns") {
    val ac = new AhoCorasick(IndexedSeq("x", "xyz", "zzz"))
    assert(ac.countMatches("xyzxyz") == 2 + 2) // x x2, xyz x2
    assert(ac.distinctMatches("no match here").isEmpty)
    assert(ac.distinctMatches("xyz").map(ac.patterns) == Set("x", "xyz"))
  }

  test("empty patterns are rejected loudly") {
    assertThrows[IllegalArgumentException](new AhoCorasick(IndexedSeq("a", "")))
    assertThrows[IllegalArgumentException](new AhoCorasick(IndexedSeq.empty))
  }

  test("unicode patterns match on char boundaries") {
    val ac = new AhoCorasick(IndexedSeq("é", "naïve", "日本"))
    assert(ac.distinctMatches("a naïve 日本語 café").map(ac.patterns) ==
      Set("é", "naïve", "日本"))
  }
}
