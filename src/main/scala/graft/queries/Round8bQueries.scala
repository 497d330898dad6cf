package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-8 continuation: REAL video containers (see ops/VideoCodec.scala)
  * — AVI/RIFF with Motion-JPEG frames through the real JPEG decoder, and
  * YUV4MPEG2 with genuine 4:2:0 plane arithmetic. This retires the last
  * multimodal family ("video") from the documented generic stub.
  */
object Round8bQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // REAL video decode #1: a valid AVI (RIFF chunk walk: hdrl/avih,
    // strl/strh/strf, movi, idx1) whose 00dc chunks are baseline JPEGs
    // decoded by ops/JpegCodec (Huffman + dequant + IDCT). The batch
    // asserts idx1 == movi walk per file, then decodes EVERY frame.
    // Frame f's pixel law is the JPEG block law keyed by id + f*17.
    "mm_avi_mjpeg" -> ((s, dir) => {
      import graft.ops.VideoCodec
      val ids = t(s, dir, "documents").filter(col("doc_id") < 24)
        .select(col("doc_id"))
      VideoCodec.decodeAviBatch(
          VideoCodec.syntheticAvis(ids, "doc_id", 3, 64, 32),
          "doc_id", "video")
        .orderBy(col("doc_id"), col("frame"))
    }),

    // REAL video decode #2: random access through the idx1 index — only
    // frames {0, 2} are located (seek) and decoded; frame 1's bytes are
    // never touched. At 100 TB this is the difference between reading
    // the sampled frames and decoding the whole corpus.
    "mm_avi_seek" -> ((s, dir) => {
      import graft.ops.VideoCodec
      val ids = t(s, dir, "documents").filter(col("doc_id") < 24)
        .select(col("doc_id"))
      VideoCodec.sampleAviBatch(
          VideoCodec.syntheticAvis(ids, "doc_id", 3, 64, 32),
          "doc_id", "video", Seq(0, 2))
        .orderBy(col("doc_id"), col("frame"))
    }),

    // REAL video decode #3: YUV4MPEG2 — tokenized parameter header,
    // FRAME records, planar 4:2:0 walk (luma w*h + two quarter-size
    // chroma planes, neutrality-asserted). Luma law:
    // (id*11 + f*19 + 2x + 3y) mod 256.
    "mm_y4m_decode" -> ((s, dir) => {
      import graft.ops.VideoCodec
      val ids = t(s, dir, "documents").filter(col("doc_id") < 24)
        .select(col("doc_id"))
      VideoCodec.decodeY4mBatch(
          VideoCodec.syntheticY4ms(ids, "doc_id", 3, 32, 16),
          "doc_id", "video")
        .orderBy(col("doc_id"), col("frame"))
    }),

    // Wikipedia-dump-shaped XML ingestion through Spark 4's NATIVE
    // from_xml: each doc becomes a mediawiki-like <page> record
    // (entity-escaped on construction, the way a dump writer emits it),
    // then the parse side — the operator under test — extracts the
    // nested revision fields and aggregates ONLY parsed values. The
    // oracle recomputes from the base table, so any parser infidelity
    // (dropped entity, trimmed text, misnested field) desyncs the hash.
    // Per-row codegen + one bounded groupBy — no scale hazard.
    "ml_wiki_xml" -> ((s, dir) => {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.types.StructType
      val esc: Column => Column = c => regexp_replace(
        regexp_replace(regexp_replace(c, "&", "&amp;"), "<", "&lt;"),
        ">", "&gt;")
      val docs = t(s, dir, "documents")
        .filter(length(coalesce(col("text"), lit(""))) > 0)
      val raw = docs.select(concat(
          lit("<page><id>"), col("doc_id"),
          lit("</id><title>Doc "), col("doc_id"),
          lit("</title><revision><lang>"), col("lang"),
          lit("</lang><text>"), esc(col("text")),
          lit("</text></revision></page>")).as("xml"))
      val schema = StructType.fromDDL(
        "id BIGINT, title STRING, revision STRUCT<lang: STRING, text: STRING>")
      raw.select(from_xml(col("xml"), schema).as("p"))
        .select(col("p.id").as("doc_id"), col("p.title").as("title"),
          col("p.revision.lang").as("lang"),
          col("p.revision.text").as("text"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_pages"),
          sum(col("doc_id")).as("sum_id"),
          sum(length(col("text"))).as("chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("words"),
          min(col("title")).as("first_title"))
        .orderBy(col("lang"))
    }),

    // Double-eager aggregation (plans/EagerAggBoth.scala — reference
    // PushDownAggThroughJoin.java): aggregates on BOTH inputs of the
    // customer-orders join are pre-aggregated below it; the join runs
    // over two group-level relations and the final agg restores join
    // multiplicity via per-group counts. The eager plan is forced,
    // plan-asserted (both partial markers below the join) and EXECUTED;
    // its rows are what the driver hashes against the plain-join oracle.
    "opt_eager_agg_both" -> ((s, dir) => {
      val df = t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_nationkey").cast("long")).as("sl"),
          sum(month(col("o_orderdate")).cast("long")).as("sr"),
          min(col("o_totalprice")).as("mnp"))
        .orderBy(col("c_mktsegment"))
      Q.withFlag(s, "spark.graft.eagerAggBoth.enabled") {
        // marker-presence assert only: under the all-rules hunt,
        // AggByUnique legitimately collapses the left pre-agg (customer
        // groups by its unique c_custkey, so cntL == 1 folds away) —
        // the strict both-sides-below-the-join structural assert lives
        // in EagerAggBothSpec where the flag runs isolated.
        val opt = df.queryExecution.optimizedPlan
        require(opt.toString.contains("__eager2_p_"),
          s"double-eager aggregation did not fire:\n$opt")
        val rows = df.collect() // executes the double-eager physical plan
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
    }),

    // Outer-join -> anti-join conversion (plans/OuterToAnti.scala —
    // reference ConvertOuterJoinToAntiJoin.java): the "customers with
    // no orders" idiom. Spark natively materializes the full outer
    // join then filters; the rewrite runs LEFT ANTI (probe
    // short-circuits on first match, unmatched-bounded output). Plan
    // asserted: LeftAnti present, no LeftOuter survives; rows from the
    // rewritten plan hash against the outer-join oracle.
    "opt_outer_to_anti" -> ((s, dir) => {
      val df = t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left")
        .filter(col("o_custkey").isNull) // customers with no 'F' order
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("c_custkey")).as("sc"))
        .orderBy(col("c_mktsegment"))
      Q.withFlag(s, "spark.graft.outerToAnti.enabled") {
        import org.apache.spark.sql.catalyst.plans.logical.Join
        import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftOuter}
        val types = df.queryExecution.optimizedPlan
          .collect { case j: Join => j.joinType }
        require(types.contains(LeftAnti) && !types.contains(LeftOuter),
          s"outer->anti did not fire: $types\n${df.queryExecution.optimizedPlan}")
        val rows = df.collect() // executes the anti-join physical plan
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
    }),

    // CCNet-style perplexity bucketing (Wenzek et al. '19): per-doc LM
    // score (unigram mean NLL, the ml_unigram_logprob discipline), then
    // head/middle/tail terciles PER LANGUAGE. Bucket boundaries are
    // rank-based over a total order (rounded score, doc_id) — integer
    // ntile output, no float threshold compares, so both engines cut
    // identically. Scale: one explode pass + per-lang window; at 100 TB
    // the exact per-lang sort is the stated CCNet computation (a cheaper
    // variant would broadcast approx quantile thresholds — documented
    // trade, not taken, because buckets would stop being exact).
    "ml_perplexity_bucket" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("word"))
      val cnt = words.groupBy(col("word")).agg(count(lit(1)).as("c"))
      val tot = cnt.agg(sum(col("c")).as("n"))
      val nll = words.join(broadcast(cnt), "word").crossJoin(broadcast(tot))
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(-log(col("c") / col("n"))), 6).as("nll"))
      val w = Window.partitionBy(col("lang")).orderBy(col("nll"), col("doc_id"))
      nll.withColumn("bucket", ntile(3).over(w))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("tokens"),
          min(col("nll")).as("mn_nll"), max(col("nll")).as("mx_nll"),
          sum(col("doc_id")).as("chk"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Deterministic global shuffle + shard assignment for training
    // (the "shuffle the corpus into N shards" step every pretraining
    // run does): shard by a multiplicative hash of doc_id, order within
    // each shard by a SECOND hash (the interleave), fingerprint the
    // exact order with sum(pos * doc_id). Reproducible end to end — no
    // RNG, any engine derives the same byte order. The in-query
    // balance assert pins the hash's spread (max/min shard size < 2x).
    // Scale: ONE shuffle (the per-shard window); no global sort.
    "ml_train_shard" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val sharded = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .withColumn("shard",
          pmod(col("doc_id") * lit(2654435761L), lit(64L)).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy(col("shard")).orderBy(
            pmod(col("doc_id") * lit(40503L) + lit(9973L), lit(999983L)),
            col("doc_id"))))
      val out = sharded.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"),
          sum(col("pos") * col("doc_id")).as("order_chk"))
      val st = out.agg(max(col("n_docs")), min(col("n_docs"))).collect()(0)
      require(st.getLong(0) < 2 * st.getLong(1),
        s"shard imbalance: max=${st.getLong(0)} min=${st.getLong(1)}")
      out.orderBy(col("shard"))
    })
  )

  def oracle: Map[String, String] = Map(

    "mm_avi_mjpeg" -> """
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
      fr AS (SELECT unnest([0, 1, 2]) AS frame),
      px AS (SELECT doc_id, frame, i,
                    ((doc_id + frame * 17) * 7
                     + 3 * ((i % 64) // 8) + 5 * ((i // 64) // 8)) % 256 AS v
             FROM ids, fr, (SELECT unnest(range(0, 2048)) AS i) g)
      SELECT doc_id, frame, 64 AS w, 32 AS h, count(*) AS n_px,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum((i + 1) * v) AS BIGINT) AS chk
      FROM px GROUP BY doc_id, frame ORDER BY doc_id, frame""",

    "mm_avi_seek" -> """
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
      fr AS (SELECT unnest([0, 2]) AS frame),
      px AS (SELECT doc_id, frame, i,
                    ((doc_id + frame * 17) * 7
                     + 3 * ((i % 64) // 8) + 5 * ((i // 64) // 8)) % 256 AS v
             FROM ids, fr, (SELECT unnest(range(0, 2048)) AS i) g)
      SELECT doc_id, frame, 64 AS w, 32 AS h, count(*) AS n_px,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum((i + 1) * v) AS BIGINT) AS chk
      FROM px GROUP BY doc_id, frame ORDER BY doc_id, frame""",

    "mm_y4m_decode" -> """
      WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 24),
      fr AS (SELECT unnest([0, 1, 2]) AS frame),
      px AS (SELECT doc_id, frame, i,
                    (doc_id * 11 + frame * 19
                     + 2 * (i % 32) + 3 * (i // 32)) % 256 AS v
             FROM ids, fr, (SELECT unnest(range(0, 512)) AS i) g)
      SELECT doc_id, frame, 32 AS w, 16 AS h, count(*) AS n_px,
             CAST(sum(v) AS BIGINT) AS sum_v,
             CAST(sum((i + 1) * v) AS BIGINT) AS chk
      FROM px GROUP BY doc_id, frame ORDER BY doc_id, frame""",

    "ml_wiki_xml" -> """
      SELECT lang, count(*) AS n_pages,
             CAST(sum(doc_id) AS BIGINT) AS sum_id,
             CAST(sum(length(text)) AS BIGINT) AS chars,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS words,
             min('Doc ' || doc_id) AS first_title
      FROM documents WHERE length(coalesce(text, '')) > 0
      GROUP BY lang ORDER BY lang""",

    "opt_eager_agg_both" -> """
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(c_nationkey) AS BIGINT) AS sl,
             CAST(sum(month(o_orderdate)) AS BIGINT) AS sr,
             min(o_totalprice) AS mnp
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "opt_outer_to_anti" -> """
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS sc
      FROM customer
      LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
        ON c_custkey = o_custkey
      WHERE o_custkey IS NULL
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "ml_perplexity_bucket" -> """
      WITH words AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
                     FROM documents),
      cnt AS (SELECT word, count(*) AS c FROM words GROUP BY word),
      tot AS (SELECT sum(c) AS n FROM cnt),
      nll AS (SELECT doc_id, lang, count(*) AS n_tokens,
                     round(avg(-ln(c / n)), 6) AS nll
              FROM words JOIN cnt USING (word), tot GROUP BY doc_id, lang),
      b AS (SELECT *, ntile(3) OVER (PARTITION BY lang
                                     ORDER BY nll, doc_id) AS bucket
            FROM nll)
      SELECT lang, CAST(bucket AS INT) AS bucket, count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS tokens,
             min(nll) AS mn_nll, max(nll) AS mx_nll,
             CAST(sum(doc_id) AS BIGINT) AS chk
      FROM b GROUP BY lang, bucket ORDER BY lang, bucket""",

    "ml_train_shard" -> """
      WITH s AS (SELECT doc_id, len(string_split(text, ' ')) AS toks,
                        CAST((doc_id * 2654435761) % 64 AS INT) AS shard
                 FROM documents),
      p AS (SELECT doc_id, toks, shard,
                   row_number() OVER (PARTITION BY shard
                     ORDER BY (doc_id * 40503 + 9973) % 999983, doc_id) AS pos
            FROM s)
      SELECT shard, count(*) AS n_docs, CAST(sum(toks) AS BIGINT) AS tokens,
             CAST(sum(pos * doc_id) AS BIGINT) AS order_chk
      FROM p GROUP BY shard ORDER BY shard""")
}
