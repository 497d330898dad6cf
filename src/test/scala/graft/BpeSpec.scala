package graft

import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE training/application (ops/Bpe.scala) checked against an
  * INDEPENDENT naive reimplementation: single-machine mutable-map pair
  * counting, recursive merge application, and training-order (not
  * lowest-rank-first) tokenization — three different algorithms that
  * must land on identical results. */
class BpeSpec extends AnyFunSuite {
  import TestSpark._

  // ---- independent naive implementation --------------------------------

  private def naiveApply(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (a + b) :: naiveApply(rest, l, r)
      case a :: rest => a :: naiveApply(rest, l, r)
      case Nil => Nil
    }

  private def naiveTrain(words: Map[String, Long], k: Int,
                         minCount: Long = 2L): Seq[(String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, c) => Bpe.wordToSymbols(w).toList -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    var stop = false
    for (_ <- 0 until k if !stop) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          pc(p) = pc.getOrElse(p, 0L) + c
        }
      }
      val cands = pc.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
      cands.headOption match {
        case Some(((l, r), c)) if c >= minCount =>
          out += ((l, r, c))
          vocab = vocab.toSeq
            .map { case (syms, cnt) => naiveApply(syms, l, r) -> cnt }
            .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        case _ => stop = true
      }
    }
    out.result()
  }

  /** Training-order application: run every merge over the word in rank
    * sequence — the classical equivalent of lowest-rank-first greedy. */
  private def naiveTokenize(w: String, merges: Seq[(String, String)]): List[String] =
    merges.foldLeft(Bpe.wordToSymbols(w).toList) {
      case (syms, (l, r)) => naiveApply(syms, l, r)
    }

  // ---- laws ------------------------------------------------------------

  test("distributed train == naive train on the documents corpus") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 300)
    val engine = Bpe.train(docs, "text", numMerges = 12)
    import spark.implicits._
    val words = docs
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val naive = naiveTrain(words, 12)
    assert(engine.map(m => (m.left, m.right, m.count)) == naive,
      s"merge sequences diverge:\n engine=${engine}\n naive=$naive")
  }

  test("greedy lowest-rank-first tokenize == training-order application") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 200)
    val merges = Bpe.train(docs, "text", numMerges = 10)
    val rankOf = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val seqMerges = merges.map(m => (m.left, m.right))
    val r = new scala.util.Random(42)
    val samples = Seq("the", "and", "a", "aaaa", "hello", "", "x") ++
      (1 to 50).map(_ => r.alphanumeric.take(1 + r.nextInt(10)).mkString)
    samples.foreach { w =>
      assert(Bpe.tokenizeWord(w, rankOf) == naiveTokenize(w, seqMerges),
        s"tokenize divergence on '$w'")
    }
  }

  test("round-trip is exact on nasty inputs (multi-space, unicode, empties)") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "a  b"), (2L, ""), (3L, " lead"), (4L, "trail "),
      (5L, "emoji 😀 pair"), (6L, "tab\there"), (7L, "</w> literal"))
    val df = nasty.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", numMerges = 5, minCount = 1L)
    val out = Bpe.tokenize(df, "doc_id", "text", merges)
      .select("doc_id", "detok").as[(Long, String)].collect().toMap
    nasty.foreach { case (id, t) =>
      assert(out(id) == t, s"round-trip broke for $id: '${out(id)}' != '$t'")
    }
  }

  test("merge counts are non-increasing and all >= minCount") {
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 300)
    val merges = Bpe.train(docs, "text", numMerges = 12)
    assert(merges.nonEmpty)
    merges.sliding(2).foreach {
      case Seq(a, b) => assert(b.count <= a.count,
        s"count grew: ${a} -> ${b}")
      case _ =>
    }
    assert(merges.forall(_.count >= 2))
    assert(merges.map(_.rank) == merges.indices)
  }

  test("single-merge application handles the overlapping-pair convention") {
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a", "</w>"), "a", "a")
      == Seq("aa", "aa", "</w>"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "</w>"), "a", "a")
      == Seq("aa", "a", "</w>"))
  }

  test("driver-local and forced-distributed merge loops learn identical sequences") {
    // under the vocab cap the K-merge loop runs driver-local (zero
    // Spark jobs); cap 0 forces the distributed per-step fallback —
    // both must produce the same merges, counts, and ranks
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 200)
    val local = Bpe.train(docs, "text", 12)
    val dist = graft.queries.Q.withFlag(spark, "spark.graft.bpe.vocabCap", "0") {
      Bpe.train(docs, "text", 12)
    }
    assert(local.nonEmpty && local == dist,
      s"local/distributed merge sequences diverged:\n$local\nvs\n$dist")
  }
}
