package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Aho-Corasick multi-pattern matcher — the blocklist-scan primitive
  * behind C4-style badwords filtering and PII keyword screens. At
  * 100 TB the difference between this and N `contains()` predicates is
  * N full scans of every document vs ONE automaton pass per document:
  * the pattern set (hundreds of entries in the public badwords lists)
  * compiles once on the driver, broadcasts, and each executor streams
  * text through the goto/fail graph in O(len + matches).
  *
  * Classic construction (Aho & Corasick '75): a trie over the patterns,
  * BFS failure links (longest proper suffix that is also a trie path),
  * and output sets accumulated through the failure chain so nested and
  * overlapping patterns ("scan" inside "table scan", "aa" in "aaaa")
  * all report at every end position.
  */
final class AhoCorasick(val patterns: IndexedSeq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "patterns must be non-empty strings")

  private val next = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  private val out = scala.collection.mutable.ArrayBuffer(Set.empty[Int])
  private val fail = scala.collection.mutable.ArrayBuffer(0)

  // trie
  patterns.zipWithIndex.foreach { case (p, i) =>
    var s = 0
    p.foreach { c =>
      s = next(s).getOrElseUpdate(c, {
        next += scala.collection.mutable.Map.empty[Char, Int]
        out += Set.empty[Int]
        fail += 0
        next.size - 1
      })
    }
    out(s) = out(s) + i
  }
  // BFS failure links; output sets inherit through the fail chain
  locally {
    val q = scala.collection.mutable.Queue.empty[Int]
    next(0).valuesIterator.foreach { v => fail(v) = 0; q += v }
    while (q.nonEmpty) {
      val u = q.dequeue()
      next(u).foreach { case (c, v) =>
        q += v
        var f = fail(u)
        while (f != 0 && !next(f).contains(c)) f = fail(f)
        val target = next(f).getOrElse(c, 0)
        fail(v) = if (target != v) target else 0
        out(v) = out(v) ++ out(fail(v))
      }
    }
  }

  private def step(s0: Int, c: Char): Int = {
    var s = s0
    while (s != 0 && !next(s).contains(c)) s = fail(s)
    next(s).getOrElse(c, 0)
  }

  /** Distinct pattern indices occurring anywhere in `text`. */
  def distinctMatches(text: String): Set[Int] = {
    var s = 0
    var found = Set.empty[Int]
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      if (out(s).nonEmpty) found = found ++ out(s)
      i += 1
    }
    found
  }

  /** Total occurrence count over all patterns, counting every end
    * position (overlaps included). */
  def countMatches(text: String): Long = {
    var s = 0
    var n = 0L
    var i = 0
    while (i < text.length) {
      s = step(s, text.charAt(i))
      n += out(s).size
      i += 1
    }
    n
  }
}

object AhoCorasick {

  /** One-pass blocklist scan: broadcast the compiled automaton, map per
    * partition; output (id, n_matched, matched-csv sorted). */
  def scan(docs: DataFrame, idCol: String, textCol: String,
           patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.toIndexedSeq
    val ac = spark.sparkContext.broadcast(new AhoCorasick(pats))
    docs.select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")).as(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val a = ac.value
        it.map { case (id, text) =>
          val m = a.distinctMatches(text).toSeq.map(pats).sorted
          (id, m.size.toLong, m.mkString(","))
        }
      }.toDF(idCol, "n_matched", "matched")
  }
}
