package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application as distributed
  * dataflow — the "train the tokenizer on the corpus" job every
  * pretraining pipeline runs before anything else (Sennrich et al. '16;
  * the GPT-2/HF construction with an end-of-word marker symbol).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - ONE corpus-wide shuffle builds the (word, count) table; from
  *    there on everything is VOCABULARY-sized (Heaps' law bounds
  *    distinct words far below corpus size — this is exactly why the
  *    classical BPE trainers operate on word counts, not the corpus).
  *  - the K-merge loop runs DRIVER-LOCAL over the collected word-count
  *    table when it fits `spark.graft.bpe.vocabCap` (default 1M words
  *    — the common case by Heaps' law; K ≈ 30k production merges cost
  *    zero Spark jobs). Over the cap, each merge step falls back to
  *    one bounded pair-count aggregation + a 1-row argmax — K bounded
  *    shuffles of a bounded table, never the corpus.
  *  - application (tokenize) broadcasts the learned merge ranks and is
  *    a pure per-partition map over the corpus.
  *
  * Determinism: argmax tie-break is (count DESC, left ASC, right ASC),
  * merge application is left-to-right greedy — both pinned by
  * `BpeSpec` against an independent naive reimplementation.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  val EndOfWord = "</w>"

  /** Unicode-correct symbol seed: one symbol per code point, plus the
    * end-of-word marker. */
  def wordToSymbols(w: String): Seq[String] = {
    val b = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b += EndOfWord
    b.result()
  }

  /** Left-to-right greedy single-merge application ("aaaa" + (a,a) ->
    * ["aa","aa"], the standard convention). */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `numMerges` merges over the corpus' space-separated words.
    * Stops early when the best pair occurs fewer than `minCount` times.
    *
    * Two-phase design (r8-verdict fix of the K-jobs-with-K-collects
    * shape): the ONE corpus-wide shuffle builds the (word, count)
    * table; that table is VOCABULARY-bounded (Heaps' law), so when it
    * fits under `spark.graft.bpe.vocabCap` (default 1M distinct words
    * — tens of MB of symbols) the K-merge loop runs DRIVER-LOCAL, the
    * classical in-memory BPE trainer: K ≈ 30k production merges cost
    * zero Spark jobs instead of 30k scheduler round-trips over a table
    * that fits one machine by construction. Over the cap, the
    * distributed per-step loop (one bounded aggregation + a 1-row
    * argmax per merge) remains as the fallback — same tie-breaks, same
    * merge sequence. Both paths are pinned against the independent
    * naive trainer in `BpeSpec`. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-wide shuffle
    val vocab0: Dataset[(Seq[String], Long)] = docs
      .select(explode(split(coalesce(col(textCol), lit(""))," ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (wordToSymbols(w), c) }
      .localCheckpoint()
    val cap = spark.conf.getOption("spark.graft.bpe.vocabCap")
      .map(_.toLong).getOrElse(1000000L)
    if (vocab0.count() <= cap)
      trainLocal(vocab0.collect(), numMerges, minCount)
    else trainDistributed(vocab0, numMerges, minCount)
  }

  /** Driver-local merge loop over the collected vocabulary — identical
    * tie-breaks ((count DESC, left ASC, right ASC)) and identical
    * left-to-right greedy merge application, so the merge sequence
    * matches the distributed path symbol-for-symbol. */
  private def trainLocal(vocab0: Array[(Seq[String], Long)], numMerges: Int,
                         minCount: Long): Seq[Merge] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    var lastCount = Long.MaxValue
    while (rank < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          counts.merge((syms(i), syms(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestC = 0L
      counts.forEach { (k, v) =>
        if (best == null || v > bestC ||
            (v == bestC && (k._1 < best._1 ||
              (k._1 == best._1 && k._2 < best._2)))) {
          best = k; bestC = v
        }
      }
      if (best == null || bestC < minCount) done = true
      else {
        // law: the chosen count never increases step-over-step — new
        // pairs created by a merge occur at most as often as the merge
        // that created them
        require(bestC <= lastCount,
          s"BPE max-count monotonicity violated: $bestC after $lastCount")
        lastCount = bestC
        merges += Merge(rank, best._1, best._2, bestC)
        val (l, r) = best
        vocab = vocab.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
        rank += 1
      }
    }
    merges.result()
  }

  /** Over-cap fallback: the vocab stays a Dataset the whole way — only
    * the per-step argmax row ever reaches the driver. localCheckpoint
    * (eager) materializes AND truncates lineage — without it each merge
    * step nests the previous step's plan and the tree (hence every plan
    * print and re-optimization) grows without bound; this is the
    * standard iterative-Spark discipline (GraphX/ALS do the same). */
  private def trainDistributed(vocab0: Dataset[(Seq[String], Long)],
                               numMerges: Int, minCount: Long): Seq[Merge] = {
    import vocab0.sparkSession.implicits._
    var vocab = vocab0
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    var lastCount = Long.MaxValue
    while (rank < numMerges && !done) {
      val best = vocab.flatMap { case (syms, c) =>
        syms.iterator.sliding(2).withPartial(false)
          .map(p => ((p.head, p(1)), c))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .orderBy(desc("_3"), asc("_1"), asc("_2"))
        .limit(1).collect() // 1 row: the argmax only
      best.headOption match {
        case Some((l, r, c)) if c >= minCount =>
          require(c <= lastCount,
            s"BPE max-count monotonicity violated: $c after $lastCount")
          lastCount = c
          merges += Merge(rank, l, r, c)
          vocab = vocab.map { case (syms, cnt) =>
            (applyMerge(syms, l, r), cnt)
          }.localCheckpoint()
          rank += 1
        case _ => done = true
      }
    }
    merges.result()
  }

  /** Greedy lowest-rank-first application of the full learned merge
    * list to one word (the standard BPE tokenize loop). */
  def tokenizeWord(w: String, rankOf: Map[(String, String), Int]): Seq[String] = {
    var syms = wordToSymbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val rk = rankOf.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bi = i }
        i += 1
      }
      if (bi < 0 || bestRank == Int.MaxValue) continue = false
      else {
        val m = merges2(syms, bi)
        syms = m
      }
    }
    syms
  }

  private def merges2(syms: Seq[String], at: Int): Seq[String] =
    (syms.take(at) :+ (syms(at) + syms(at + 1))) ++ syms.drop(at + 2)

  /** Tokenize the corpus with a learned merge list: broadcast ranks,
    * pure per-partition map. Output: (idCol, tokens array, detok) where
    * detok is the EXACT reconstruction — `</w>`-terminated tokens
    * rejoin into the original words and single spaces. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rankOf = spark.sparkContext.broadcast(
      merges.map(m => (m.left, m.right) -> m.rank).toMap)
    docs.select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")).as(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rk = rankOf.value
        it.map { case (id, text) =>
          val words = text.split(" ", -1) // keep trailing empties exact
          var n = 0L
          // the reconstruction flows to the output (and the oracle), so
          // a tokenizer infidelity surfaces as a value mismatch — no
          // circular self-check against the input
          val detok = words.map { w =>
            val t = tokenizeWord(w, rk)
            n += t.length
            t.mkString("").stripSuffix(EndOfWord)
          }.mkString(" ")
          (id, n, detok)
        }
      }.toDF(idCol, "n_tokens", "detok")
  }
}
