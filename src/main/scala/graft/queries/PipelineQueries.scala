package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PipelineOps
import Q.t

/** Training-data pipeline operators over the documents corpus — the
  * passes a pretraining dataset goes through between raw crawl and
  * tokenizer: PII scrubbing, repetition-based quality scoring
  * (Gopher/C4-style signals), stratified sampling with exact quotas,
  * source mixture re-weighting, and context-window sequence packing.
  * Every query is value-exact against the DuckDB oracle.
  *
  * Scale notes (100 TB):
  *  - pii: pure per-row codegen regex — embarrassingly parallel.
  *  - gopher: explode→two-level groupBy keyed by doc_id — shards on
  *    doc_id, partial aggregation map-side; no doc ever needs to be
  *    co-resident with another.
  *  - stratified: row_number per stratum with a LITERAL pre-filter at
  *    the max quota so Spark's WindowGroupLimit prunes per-partition
  *    BEFORE the stratum shuffle (the exact per-stratum quota refines
  *    after); without it every row of the biggest stratum sorts on one
  *    node.
  *  - mixture: per-row deterministic repeat counts + explode — no
  *    shuffle at all until the caller's next op.
  *  - packing: running token sum per (lang) stream — inherently
  *    sequential per stream; at scale you shard the stream key (e.g.
  *    (lang, doc_id div N)) and pack each shard independently, which
  *    changes bin numbering but not the packing property.
  */
object PipelineQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // deterministic synthetic PII is appended in-query (the corpus is
    // clean), then redacted and counted per source
    "ml_pii_redact" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // coalesce pins NULL-text semantics: Spark concat is NULL-in →
      // NULL-out while DuckDB concat skips NULLs; the corpus has no NULL
      // text today, but a regenerated fixture with one must not silently
      // diverge engine vs oracle (coalesce on BOTH sides).
      val aug = docs.select(col("doc_id"), col("source"), concat(
          coalesce(col("text"), lit("")), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
          lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1"),
          when(pmod(col("doc_id"), lit(3)) === 0, " id 123-45-6789").otherwise(""))
        .as("text"))
      aug.select(col("source"),
          PipelineOps.redactPii(col("text")).as("rtext"),
          PipelineOps.piiCount(col("text"), PipelineOps.EmailPat).as("n_email"),
          PipelineOps.piiCount(col("text"), PipelineOps.IdPat).as("n_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_email").as("n_emails"),
          sum("n_id").as("n_ids"), sum(length(col("rtext"))).as("red_chars"))
        .orderBy("source")
    }),

    // per-doc repetition signals: duplicate-word fraction, top-word and
    // top-bigram mass (the Gopher repetition filters).
    // r17 single-scan shape: the old two-branch spelling scanned and
    // split the corpus twice (word leg + bigram leg) and reconciled
    // with a doc_id join; the r16 fused-explode attempt lost because
    // per-token struct-building HOF lambdas are interpreted. This
    // spelling stays whole-stage-codegen end to end: posexplode the
    // word array once, emit per position a 2-element array of
    // (kind, token-hash) structs — array()/struct()/xxhash64 are all
    // codegen constructs, no lambdas — and run ONE
    // (doc_id, kind, hash) count plus ONE doc_id rollup. Token strings
    // never leave the scan task: the intra-doc group keys are 64-bit
    // xxhash64 of the word / of the (word, next-word) pair (word-pair
    // identity == bigram-string identity since words cannot contain
    // the split space; intra-doc 64-bit collisions are the same
    // ~1e-13-odds class as the minhash hashed-shingle verify, and the
    // DuckDB oracle recomputes with strings). Docs without a bigram
    // (single-word) drop via the n_bigrams filter exactly like the old
    // inner join.
    "ml_quality_gopher" -> ((s, dir) => {
      val tagged = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("ws"), posexplode(col("ws")))
        .toDF("doc_id", "ws", "p", "w")
        .select(col("doc_id"), explode(
          when(col("p") < size(col("ws")) - 1, array(
            struct(lit(0).as("kind"), xxhash64(col("w")).as("h")),
            struct(lit(1).as("kind"),
              xxhash64(col("w"), element_at(col("ws"), col("p") + 2)).as("h"))))
          .otherwise(array(
            struct(lit(0).as("kind"), xxhash64(col("w")).as("h"))))).as("t"))
        .select(col("doc_id"), col("t.kind").as("kind"), col("t.h").as("h"))
      tagged.groupBy("doc_id", "kind", "h").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(
          sum(when(col("kind") === 0, col("n"))).as("n_words"),
          count(when(col("kind") === 0, lit(1))).as("n_distinct"),
          max(when(col("kind") === 0, col("n"))).as("top_word_n"),
          sum(when(col("kind") === 1, col("n"))).as("n_bigrams"),
          max(when(col("kind") === 1, col("n"))).as("top_bigram_n"))
        .filter(col("n_bigrams").isNotNull)
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          col("top_word_n"), col("top_bigram_n"),
          round(lit(1.0) - col("n_distinct") * lit(1.0) / col("n_words"), 9)
            .as("dup_frac"),
          round(col("top_bigram_n") * lit(1.0) / col("n_bigrams"), 9)
            .as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // exact per-language quotas, deterministic hash order. The literal
    // rk<=30 pre-filter exists so WindowGroupLimit prunes per-partition
    // before the shuffle; the CASE quota refines it exactly.
    "ml_sample_stratified" -> ((s, dir) => {
      val ranked = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        row_number().over(Window.partitionBy(col("lang"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).as("rk"))
      ranked.filter(col("rk") <= 30)
        .filter(col("rk") <= when(col("lang") === "en", 30).otherwise(10))
        .orderBy("lang", "rk")
    }),

    // deterministic source re-weighting: floor(w) full copies plus one
    // more for a (doc_id mod 100)-coded fraction of docs — exact
    // mixture proportions with no RNG, reproducible across runs/engines
    "ml_mixture_upsample" -> ((s, dir) => {
      val wt = when(col("source") === "src0", 2.5)
        .when(col("source") === "src1", 1.0)
        .when(col("source") === "src2", 0.25).otherwise(0.5)
      val reps = (floor(wt).cast("long") +
        when(pmod(col("doc_id"), lit(100)) < round((wt - floor(wt)) * 100).cast("long"), 1L)
          .otherwise(0L)).as("reps")
      t(s, dir, "documents").select(col("doc_id"), col("source"), reps)
        .select(col("doc_id"), col("source"),
          explode(when(col("reps") >= 1, sequence(lit(1L), col("reps")))
            .otherwise(array().cast("array<bigint>"))).as("i"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("doc_id") * col("i")).as("chk"))
        .orderBy("source")
    }),

    // benchmark decontamination (the n-gram test-set overlap removal a
    // pretraining corpus gets — GPT-3 appendix C / Gopher §A.8 style):
    // docs sharing any 5-gram with the held-out "benchmark" slice
    // (doc_id % 97 == 0) are dropped from the train split. Scale shape:
    // the benchmark gram set is tiny relative to the corpus, so the
    // contamination check is a broadcast LEFT SEMI join against the
    // train grams — the 100 TB side is never shuffled (at real scale
    // you'd hash grams to 64-bit and/or bloom-filter the broadcast;
    // strings kept here for oracle parity).
    "ml_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      def grams(d: DataFrame): DataFrame = d
        .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
        .select(col("doc_id"), col("source"),
          explode(filter(
            transform(col("ws"), (_, i) =>
              when(i <= size(col("ws")) - 5,
                concat_ws(" ", slice(col("ws"), i + 1, lit(5))))),
            g => g.isNotNull)).as("g"))
      val bench = grams(docs.filter(col("doc_id") % 97 === 0))
        .select(col("g")).distinct()
      val contaminated = grams(docs.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(bench), "g")
        .select(col("doc_id")).distinct()
      docs.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("chk"))
        .orderBy(col("source"))
    }),

    // seeded deterministic global shuffle (training-order permutation,
    // reproducible across runs and engines): rank by md5 of a seeded
    // key. Scale shape: the head of the permutation comes from
    // orderBy+limit = TakeOrderedAndProject (per-partition top-k, tiny
    // merge on one reducer — plan-asserted); the ranking window then
    // runs over only those 100 rows. A bare global row_number window
    // would drag the WHOLE corpus through one task. For the full
    // permutation at 100 TB you shard (hash(doc_id) % n_shards) and
    // sort within shards — same law per shard, no global exchange.
    "ml_shuffle_seeded" -> ((s, dir) => {
      val key = md5(concat(lit("seed42:"), col("doc_id").cast("string")))
      val top = t(s, dir, "documents")
        .select(col("doc_id"), key.as("k"))
        .orderBy(col("k"), col("doc_id"))
        .limit(100)
      top.select(col("doc_id"),
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("k"), col("doc_id"))).as("rk"))
        .orderBy(col("rk"))
    }),

    // deterministic linear quality classifier (fasttext-style filter
    // re-expressed as a fixed-weight logistic over handcrafted
    // features). The >0.5 cut is evaluated on the LINEAR term (z > 0 ⟺
    // sigmoid(z) > 0.5) so no transcendental sits on the decision
    // boundary; the reported average goes through exp but is rounded
    // far above ulp noise. One projection + one agg — no shuffle
    // beyond the group-by.
    "ml_quality_logistic" -> ((s, dir) => {
      val ws = split(col("text"), " ")
      val nWords = size(ws).cast("double")
      val meanWlen = aggregate(transform(ws, w => length(w)), lit(0),
        (acc, x) => acc + x).cast("double") / nWords
      val stopRatio = size(filter(ws, w =>
        w.isin("the", "a", "of", "to", "and", "in", "is", "for"))).cast("double") / nWords
      val punctRatio = (length(col("text")) -
        length(regexp_replace(col("text"), "[A-Za-z0-9 ]", ""))).cast("double") /
        length(col("text")).cast("double")
      val z = lit(-3.0) + lit(0.01) * nWords + lit(0.5) * meanWlen +
        lit(2.0) * stopRatio - lit(8.0) * punctRatio
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), z.as("z"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("z") > 0, 1L).otherwise(0L)).as("n_pos"),
          round(avg(lit(1.0) / (lit(1.0) + exp(-col("z")))), 6).as("avg_q"))
        .orderBy(col("source"))
    }),

    // sliding context-window chunking (embedding / training prep):
    // 128-token windows at stride 96 (32-token overlap), last window
    // clipped. Pure per-row explode — no shuffle at all; at 100 TB each
    // task chunks its own partition independently.
    "ml_doc_chunk" -> ((s, dir) => {
      val n = size(split(col("text"), " ")).cast("long")
      t(s, dir, "documents").filter(col("doc_id") < 300)
        .select(col("doc_id"), n.as("n"))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(0L),
            when(col("n") > 128, ceil((col("n") - 128).cast("double") / 96.0).cast("long"))
              .otherwise(0L))).as("chunk_id"))
        .select(col("doc_id"), col("chunk_id"),
          (col("chunk_id") * 96).as("start_tok"),
          least(lit(128L), col("n") - col("chunk_id") * 96).as("len_tok"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // token-budget subsampling (data-mixing selection): per source,
    // walk docs in seeded-hash order and keep while the running token
    // total stays under budget — the "fill each domain's token quota"
    // pass of mixture construction. Window is PARTITIONED by source:
    // each domain's walk is independent, so the op shards cleanly.
    "ml_token_budget" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(concat(lit("tb:"), col("doc_id").cast("string"))), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("tk"))
        .withColumn("cum", sum(col("tk")).over(w))
        .filter(col("cum") <= 20000)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("tk")).as("tokens"),
          sum(col("doc_id")).as("chk"))
        .orderBy(col("source"))
    }),

    // contiguous greedy packing into 512-token context windows: bin =
    // budget boundaries crossed before the doc starts
    "ml_seq_pack" -> ((s, dir) => {
      val tok = t(s, dir, "documents").select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val cum = tok.withColumn("cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.select(col("lang"),
          floor((col("cum") - col("n_tokens")) * lit(1.0) / 512).cast("long").as("bin"),
          col("n_tokens"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
        .orderBy("lang", "bin")
    })
  )

  val oracle: Map[String, String] = Map(
    // pattern text interpolated from PipelineOps so engine and oracle
    // provably share one regex source of truth (only the backref syntax
    // differs: Java $n vs RE2 \n)
    "ml_pii_redact" -> raw"""
      WITH aug AS (
        SELECT doc_id, source,
          concat(coalesce(text, ''), ' contact user', CAST(doc_id AS VARCHAR), '@example.com or +1-555-',
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                 ' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1',
                 CASE WHEN doc_id % 3 = 0 THEN ' id 123-45-6789' ELSE '' END) AS text
        FROM documents),
      red AS (
        SELECT doc_id, source,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
            '${PipelineOps.EmailPat}', '[EMAIL]', 'g'),
            '${PipelineOps.IdPat}', '[ID]', 'g'),
            '${PipelineOps.Ipv4CtxPat}', '\1[IP]\6', 'g'),
            '${PipelineOps.PhonePat}', '[PHONE]', 'g') AS rtext,
          CAST(len(regexp_extract_all(text, '${PipelineOps.EmailPat}')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(text, '${PipelineOps.IdPat}')) AS BIGINT) AS n_id
        FROM aug)
      SELECT source, count(*) AS n_docs, CAST(sum(n_email) AS BIGINT) AS n_emails,
             CAST(sum(n_id) AS BIGINT) AS n_ids,
             CAST(sum(length(rtext)) AS BIGINT) AS red_chars
      FROM red GROUP BY source ORDER BY source""",

    "ml_quality_gopher" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      w AS (SELECT doc_id, unnest(ws) AS w FROM t),
      wc AS (SELECT doc_id, w, count(*) AS n FROM w GROUP BY 1, 2),
      wagg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_words,
                      count(*) AS n_distinct, max(n) AS top_word_n
               FROM wc GROUP BY 1),
      b AS (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))]) AS bg
            FROM t WHERE len(ws) > 1),
      bc AS (SELECT doc_id, bg, count(*) AS n FROM b GROUP BY 1, 2),
      bagg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, max(n) AS top_bigram_n
               FROM bc GROUP BY 1)
      SELECT w.doc_id, w.n_words, w.n_distinct, w.top_word_n, b.top_bigram_n,
             round(1.0 - w.n_distinct * 1.0 / w.n_words, 9) AS dup_frac,
             round(b.top_bigram_n * 1.0 / b.n_bigrams, 9) AS top_bigram_frac
      FROM wagg w JOIN bagg b ON w.doc_id = b.doc_id ORDER BY w.doc_id""",

    "ml_sample_stratified" -> """
      WITH ranked AS (
        SELECT doc_id, lang,
          row_number() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT doc_id, lang, rk FROM ranked
      WHERE rk <= CASE WHEN lang = 'en' THEN 30 ELSE 10 END
      ORDER BY lang, rk""",

    "ml_mixture_upsample" -> """
      WITH w AS (
        SELECT doc_id, source,
          CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 1.0
                      WHEN 'src2' THEN 0.25 ELSE 0.5 END AS wt
        FROM documents),
      r AS (SELECT doc_id, source,
              CAST(floor(wt) AS BIGINT) +
              CASE WHEN (doc_id % 100) < CAST(round((wt - floor(wt)) * 100) AS BIGINT)
                   THEN 1 ELSE 0 END AS reps
            FROM w),
      x AS (SELECT doc_id, source, unnest(range(1, CAST(reps AS BIGINT) + 1)) AS i FROM r)
      SELECT source, count(*) AS n_copies, count(DISTINCT doc_id) AS n_docs,
             CAST(sum(doc_id * i) AS BIGINT) AS chk
      FROM x GROUP BY source ORDER BY source""",

    "ml_decontaminate" -> """
      WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      g AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS g
            FROM w, UNNEST(range(1, len(ws) - 3)) AS t(i)
            WHERE len(ws) >= 5),
      bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
      cont AS (SELECT DISTINCT g.doc_id FROM g JOIN bench USING (g)
               WHERE g.doc_id % 97 <> 0)
      SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS chk
      FROM documents
      WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM cont)
      GROUP BY source ORDER BY source""",

    "ml_shuffle_seeded" -> """
      SELECT doc_id, rk FROM (
        SELECT doc_id, row_number() OVER (
          ORDER BY md5('seed42:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents) t
      WHERE rk <= 100 ORDER BY rk""",

    "ml_quality_logistic" -> """
      WITH f AS (
        SELECT doc_id, source,
          -3.0 + 0.01 * CAST(len(string_split(text, ' ')) AS DOUBLE)
          + 0.5 * (CAST(list_sum(list_transform(string_split(text, ' '), w -> len(w))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE))
          + 2.0 * (CAST(len(list_filter(string_split(text, ' '),
                     w -> w IN ('the','a','of','to','and','in','is','for'))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE))
          - 8.0 * (CAST(len(text) - len(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                   / CAST(len(text) AS DOUBLE)) AS z
        FROM documents)
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             round(avg(1.0 / (1.0 + exp(-z))), 6) AS avg_q
      FROM f GROUP BY source ORDER BY source""",

    "ml_doc_chunk" -> """
      WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
                 FROM documents WHERE doc_id < 300),
      c AS (SELECT doc_id, n, unnest(range(0,
              1 + CASE WHEN n > 128
                       THEN CAST(ceil((n - 128) / 96.0) AS BIGINT)
                       ELSE 0 END)) AS chunk_id
            FROM t)
      SELECT doc_id, chunk_id, chunk_id * 96 AS start_tok,
             least(128, n - chunk_id * 96) AS len_tok
      FROM c ORDER BY doc_id, chunk_id""",

    "ml_token_budget" -> """
      WITH t AS (SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS tk
                 FROM documents),
      c AS (SELECT doc_id, source, tk,
              sum(tk) OVER (PARTITION BY source
                ORDER BY md5('tb:' || CAST(doc_id AS VARCHAR)), doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
      SELECT source, count(*) AS n_kept, CAST(sum(tk) AS BIGINT) AS tokens,
             CAST(sum(doc_id) AS BIGINT) AS chk
      FROM c WHERE cum <= 20000
      GROUP BY source ORDER BY source""",

    "ml_seq_pack" -> """
      WITH t AS (SELECT doc_id, lang,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, lang, n_tokens,
              sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM t)
      SELECT lang, CAST(floor((cum - n_tokens) * 1.0 / 512) AS BIGINT) AS bin,
             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
      FROM c GROUP BY lang, bin ORDER BY lang, bin"""
  )
}
