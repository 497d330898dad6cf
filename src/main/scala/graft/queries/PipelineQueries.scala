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
    // top-bigram mass (the Gopher repetition filters)
    "ml_quality_gopher" -> ((s, dir) => {
      val tt = t(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val wc = tt.select(col("doc_id"), explode(col("ws")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
      val wagg = wc.groupBy("doc_id").agg(
        sum("n").as("n_words"), count(lit(1)).as("n_distinct"),
        max("n").as("top_word_n"))
      val bc = tt.filter(size(col("ws")) > 1)
        .select(col("doc_id"), explode(PipelineOps.bigrams(col("ws"))).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      val bagg = bc.groupBy("doc_id").agg(
        sum("n").as("n_bigrams"), max("n").as("top_bigram_n"))
      wagg.join(bagg, "doc_id")
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
