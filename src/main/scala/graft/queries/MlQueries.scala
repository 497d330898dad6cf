package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, MultimodalOps, TextOps, VectorSearch}
import Q._

/** Training-data-pipeline operator battery: dedup (exact / minhash-LSH
  * / simhash), similarity search, text analysis, multimodal plumbing.
  * Oracles are exact where the operator is exact (LSH pipelines verify
  * candidates with exact jaccard/cosine, so their OUTPUT is exact on
  * data whose duplicate clusters sit far above the threshold — this
  * fixture's planted dups are j >= 0.85 vs threshold 0.5).
  */
object MlQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_dedup_exact" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("text")).as("n_uniq"),
          countDistinct(md5(col("text"))).as("n_uniq_h"))
        .orderBy(col("lang"))
    }),

    "ml_dedup_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, threshold = 0.5)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // INCREMENTAL dedup — the daily-ingest shape: dedup an incoming
    // shard against the standing corpus without any corpus-to-corpus
    // work. Stage 1: exact cross-set anti-join on content hash.
    // Stage 2: near-dup via cross-set banded minhash
    // (Dedup.minhashPairsAcross — corpus bands ⋈ shard bands only).
    // Per-language admission report; kept-set checksum pins the exact
    // admitted ids.
    "ml_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 3 =!= 0)
      val incoming = docs.filter(col("doc_id") % 3 === 0)
      val exactKept = incoming.join(
        corpus.select(md5(col("text")).as("h")).distinct(),
        md5(col("text")) === col("h"), "left_anti")
      val near = Dedup.minhashPairsAcross(corpus, exactKept,
        "doc_id", "text", n = 3, threshold = 0.5)
      val kept = exactKept.join(
        near.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val a1 = incoming.groupBy(col("lang")).agg(count(lit(1)).as("n_in"))
      val a2 = exactKept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_exact_kept"))
      val a3 = kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("chk"))
      a1.join(a2, Seq("lang"), "left").join(a3, Seq("lang"), "left")
        .select(col("lang"), col("n_in"),
          coalesce(col("n_exact_kept"), lit(0L)).as("n_exact_kept"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("chk"), lit(0L)).as("chk"))
        .orderBy(col("lang"))
    }),

    // simhash through the FULL banded pipeline (4x16-bit pigeonhole
    // blocks, popcount verify) with the md5-derived 60-bit word hash —
    // bit-replicable in DuckDB, so this is value-exact against an
    // oracle that re-derives the identical banding (r9: was rows-only
    // under seeded xxhash64, which stays the scale-path default in
    // Dedup.simhashPairs). The in-engine invariant check remains as a
    // belt.
    "ml_dedup_simhash" -> ((s, dir) => {
      val out = Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxDist = 16, wordHash = Dedup.md5WordHash)
      val viol = out.filter(col("id_a") >= col("id_b") ||
        col("hamming") < 0 || col("hamming") > 16).count()
      require(viol == 0, s"simhash pair invariants violated on $viol rows")
      out.orderBy(col("id_a"), col("id_b"))
    }),

    // bigram-jaccard pairs through the SAME banded minhash-LSH path as
    // ml_dedup_minhash (round-4 verdict: the bounded crossJoin was a
    // scale anti-pattern) — banding prunes the pair space, the exact-
    // jaccard verify keeps the output identical to all-pairs on this
    // fixture (every passing pair has j >= 0.9; nothing lives between
    // 0.14 and 0.9, measured).
    "ml_ngram_jaccard" -> ((s, dir) => {
      Dedup.minhashPairs(t(s, dir, "documents").filter(col("doc_id") < 500),
          "doc_id", "text", n = 2, threshold = 0.2)
        .select(col("id_a"), col("id_b"), col("jaccard").as("j"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the DEFAULT-named near-dup operator is the scale-safe path
    // (round-5 verdict items 4/10): IVF-cell-bounded pair enumeration —
    // multi-probe cell assignment bounds the candidate join, exact
    // cosine verifies inside cells. The oracle is DuckDB brute force,
    // so correctness-green == full recall at this threshold/fixture.
    // No cartesian anywhere (plan-asserted in PlanShapeSpec).
    "ml_embed_neardup" -> ((s, dir) => {
      VectorSearch.nearDupPairsIvf(t(s, dir, "embeddings"), 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // the O(N^2) baseline, explicitly named and row-cap guarded —
    // fixture-only; declared so users see the honest brute option
    "ml_embed_neardup_brute" -> ((s, dir) => {
      VectorSearch.nearDupPairsBrute(t(s, dir, "embeddings"), 0.4)
        .orderBy(col("id_a"), col("id_b"))
    }),

    // banded hyperplane-LSH pair enumeration at the real near-dup
    // regime (planted duplicates at sim ~0.99 vs natural ceiling 0.60):
    // candidates from the (band, sig) equi self-join, exact-cosine
    // verify inside buckets; oracle is DuckDB brute force over the
    // identical derived corpus, so correctness-green == full recall.
    "ml_embed_neardup_lsh" -> ((s, dir) => {
      VectorSearch.nearDupPairsLsh(plantedDupCorpus(t(s, dir, "embeddings")), 0.9)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "ml_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      VectorSearch.topK(emb, emb.filter(col("vec_id") < 5), 10)
        .orderBy(col("q_id"), col("rn"))
    }),

    // approximate ANN via hyperplane LSH — value-exact (r9): the
    // splitmix64 plane derivation is plain 64-bit integer arithmetic,
    // so the DuckDB oracle re-derives the identical plane matrix
    // (split-multiply mod-2^64 over HUGEINT), buckets, and ranks. The
    // exact-sim/recall law vs brute force is AnnSpec "LSH top-k sims
    // are a subset of brute-force sims"; the in-engine shape checks
    // remain as a belt.
    "ml_ann_lsh" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val out = VectorSearch.topKLsh(emb, emb.filter(col("vec_id") < 5), 64, 10)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("rn"))
      val viol = out
        .withColumn("prev", lag(col("sim"), 1).over(w))
        .filter(col("rn") > 10 || col("sim") > 1.000001 || col("sim") < -1.000001 ||
          (col("prev").isNotNull && col("sim") > col("prev") + 1e-9))
        .count()
      require(viol == 0, s"LSH top-k shape invariants violated on $viol rows")
      out.orderBy(col("q_id"), col("rn"))
    }),

    "ml_text_stats" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          TextOps.wsTokenCount(col("text")).as("n_ws"),
          TextOps.subwordCount(col("text")).as("n_sub"),
          TextOps.qualityScore(col("text")).as("q"),
          TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    "ml_lang_id" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), TextOps.langId(col("text")).as("pred"))
        .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("pred"))
    }),

    // resize metadata + the mapPartitions batch-decode path (one codec
    // instance per partition) — results must agree with the expression
    // stub, which the oracle replicates.
    "ml_multimodal_resize" -> ((s, dir) => {
      val blobs = t(s, dir, "documents").filter(col("doc_id") < 100)
        .withColumn("blob", MultimodalOps.makeBlob(lit("IMG0"), col("text")))
      val decoded = MultimodalOps.decodeBatch(blobs, "doc_id", "blob")
      val resized = blobs.select(col("doc_id"),
        MultimodalOps.resizeMeta(col("blob"), 640, 480).as("r"))
      decoded.join(resized, "doc_id")
        .select(col("doc_id"), col("format"), col("width"), col("height"),
          col("r.width").as("rw"), col("r.height").as("rh"),
          col("r.n_bytes").as("rbytes"))
        .orderBy(col("doc_id"))
    }),

    "ml_multimodal_meta" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .withColumn("blob", MultimodalOps.makeBlob(lit("IMG0"), col("text")))
        .withColumn("meta", MultimodalOps.decodeMeta(col("blob")))
        .select(col("doc_id"),
          col("meta.format").as("fmt"), col("meta.width").as("w"),
          col("meta.height").as("h"), col("meta.n_bytes").as("nb"),
          concat_ws(",", transform(MultimodalOps.frameOffsets(col("blob"), 4),
            x => x.cast("string"))).as("offs"))
        .orderBy(col("doc_id"))
    })
  )

  /** embeddings ∪ deterministic near-duplicate copies: every 10th
    * vector re-issued under vec_id+100000 with a small exact-integer-
    * arithmetic perturbation (0.01 * ((id*7 + j*13) mod 5 - 2) per
    * component → sim ~0.99 to its source on these unit vectors),
    * replicated verbatim in the DuckDB oracle. */
  def plantedDupCorpus(emb: DataFrame): DataFrame = {
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val dup = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + lit(100000)).as("vec_id"),
        expr("""transform(embedding, (x, j) ->
                 x + 0.01 * (CAST((vec_id * 7 + j * 13) % 5 AS DOUBLE) - 2.0))""").as("embedding"))
    base.unionAll(dup)
  }

  private[queries] val shingleSql =
    """list_distinct(CASE WHEN len(ws) >= 3
         THEN list_transform(generate_series(1, len(ws) - 2),
                i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))
         ELSE [array_to_string(ws, ' ')] END)"""

  def oracle: Map[String, String] = Map(
    "ml_dedup_exact" -> """
      SELECT lang, count(*) AS n, count(DISTINCT text) AS n_uniq,
             count(DISTINCT md5(text)) AS n_uniq_h
      FROM documents GROUP BY lang ORDER BY lang""",

    // identical banded pipeline re-derived: md5-60bit word hashes,
    // 64-bit sign-sum simhash, 4x16-bit pigeonhole blocks, popcount
    // verify (arithmetic >> then & 65535 == the logical shift on the
    // masked low bits)
    "ml_dedup_simhash" -> """
      WITH h AS (
        SELECT doc_id, CAST(concat('0x', substr(md5(wd), 1, 15)) AS BIGINT) AS wh
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS wd
              FROM documents) w),
      bits AS (
        SELECT doc_id, i,
               sum(CASE WHEN (wh >> i) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM h CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) g
        GROUP BY doc_id, i),
      sh AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY doc_id),
      banded AS (
        SELECT doc_id, sh, b, (sh >> (b * 16)) & 65535 AS key
        FROM sh CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) bb)
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
             bit_count(xor(x.sh, y.sh)) AS hamming
      FROM banded x JOIN banded y
        ON x.b = y.b AND x.key = y.key AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.sh, y.sh)) <= 16
      ORDER BY id_a, id_b""",

    // the LSH plane matrix re-derived in SQL: splitmix64 over (p, j)
    // with wrap-around 64-bit multiplies done as HUGEINT split
    // products (a*b mod 2^64 = a*lo + ((a*hi) mod 2^32)<<32), signed
    // floorMod 2001 -> [-1, 1] components — bit-identical to
    // graft.functions.BandSigs.planeComponent; then sign-bit buckets,
    // bucket-equality probe, exact cosine rank
    "ml_ann_lsh" -> """
      WITH pj AS (SELECT p.range AS p, j.range AS j
                  FROM range(0, 8) p(range), range(0, 64) j(range)),
      s0 AS (SELECT p, j,
        ((CAST(p AS HUGEINT) * 4294967296 + j) + 11400714819323198485)
          % 18446744073709551616 AS z0 FROM pj),
      x0 AS (SELECT p, j, xor(z0, z0 // 1073741824) AS a FROM s0),
      s1 AS (SELECT p, j,
        ((a * 484763065) % 18446744073709551616
         + ((a * 3210233709) % 4294967296) * 4294967296)
          % 18446744073709551616 AS z1 FROM x0),
      x1 AS (SELECT p, j, xor(z1, z1 // 134217728) AS a FROM s1),
      s2 AS (SELECT p, j,
        ((a * 321982955) % 18446744073709551616
         + ((a * 2496678331) % 4294967296) * 4294967296)
          % 18446744073709551616 AS z2 FROM x1),
      s3 AS (SELECT p, j, xor(z2, z2 // 2147483648) AS z3 FROM s2),
      sg AS (SELECT p, j,
        CASE WHEN z3 >= 9223372036854775808
             THEN z3 - 18446744073709551616 ELSE z3 END AS sv FROM s3),
      plv AS (SELECT p, list(CAST(((sv % 2001) + 2001) % 2001 - 1000 AS DOUBLE)
                             / 1000.0 ORDER BY j) AS pv
              FROM sg GROUP BY p),
      emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      buck AS (
        SELECT e.vec_id, e.v,
          CAST(sum(CASE WHEN list_inner_product(e.v, plv.pv) > 0
                   THEN CAST(1 AS BIGINT) << plv.p ELSE 0 END) AS BIGINT) AS bucket
        FROM emb e CROSS JOIN plv GROUP BY e.vec_id, e.v),
      cand AS (
        SELECT q.vec_id AS q_id, c.vec_id,
          round(list_inner_product(q.v, c.v)
            / (sqrt(list_inner_product(q.v, q.v))
             * sqrt(list_inner_product(c.v, c.v))), 6) AS sim
        FROM buck q JOIN buck c USING (bucket)
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id)
      SELECT q_id, rn, vec_id, sim FROM (
        SELECT q_id, vec_id, sim,
          row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
        FROM cand) x
      WHERE rn <= 10 ORDER BY q_id, rn""",

    "ml_dedup_minhash" -> s"""
      WITH s AS (SELECT doc_id, $shingleSql AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) w)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                   (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
      ORDER BY id_a, id_b""",

    "ml_dedup_incremental" -> s"""
      WITH corpus AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      inc AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
      ek AS (SELECT * FROM inc
             WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)),
      s_c AS (SELECT doc_id, $shingleSql AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus) w),
      s_i AS (SELECT doc_id, $shingleSql AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM ek) w),
      near AS (SELECT DISTINCT b.doc_id
               FROM s_c a JOIN s_i b
                 ON len(list_intersect(a.sh, b.sh))::DOUBLE /
                    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                    >= 0.5),
      kept AS (SELECT * FROM ek
               WHERE doc_id NOT IN (SELECT doc_id FROM near)),
      a1 AS (SELECT lang, count(*) AS n_in FROM inc GROUP BY lang),
      a2 AS (SELECT lang, count(*) AS n_exact_kept FROM ek GROUP BY lang),
      a3 AS (SELECT lang, count(*) AS n_kept, sum(doc_id) AS chk
             FROM kept GROUP BY lang)
      SELECT a1.lang, n_in,
             coalesce(n_exact_kept, 0) AS n_exact_kept,
             coalesce(n_kept, 0) AS n_kept,
             CAST(coalesce(chk, 0) AS BIGINT) AS chk
      FROM a1 LEFT JOIN a2 USING (lang) LEFT JOIN a3 USING (lang)
      ORDER BY lang""",

    "ml_ngram_jaccard" -> """
      WITH s AS (SELECT doc_id,
                   list_distinct(CASE WHEN len(ws) >= 2
                     THEN list_transform(generate_series(1, len(ws) - 1),
                            i -> concat(ws[i], ' ', ws[i+1]))
                     ELSE [array_to_string(ws, ' ')] END) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS ws
                       FROM documents WHERE doc_id < 500) w)
      SELECT id_a, id_b, j FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS j
        FROM s a JOIN s b ON a.doc_id < b.doc_id) x
      WHERE j >= 0.2 ORDER BY id_a, id_b""",

    "ml_embed_neardup" -> """
      SELECT id_a, id_b, sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) x
      WHERE sim >= 0.4 ORDER BY id_a, id_b""",

    // identical brute-force oracle: the IVF default and the brute
    // baseline must both reproduce the exact pair set
    "ml_embed_neardup_brute" -> """
      SELECT id_a, id_b, sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))), 6) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) x
      WHERE sim >= 0.4 ORDER BY id_a, id_b""",

    "ml_embed_neardup_lsh" -> """
      WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      dup AS (SELECT vec_id + 100000 AS vid,
                     list_transform(generate_series(1, len(e)),
                       j -> e[j] + 0.01 * (CAST((vec_id * 7 + (j - 1) * 13) % 5 AS DOUBLE) - 2.0)) AS e
              FROM base WHERE vec_id % 10 = 0),
      corpus AS (SELECT vec_id, e FROM base UNION ALL SELECT vid AS vec_id, e FROM dup)
      SELECT id_a, id_b, sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_inner_product(a.e, b.e)
                 / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))), 6) AS sim
        FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id) x
      WHERE sim >= 0.9 ORDER BY id_a, id_b""",

    "ml_ann_topk" -> """
      SELECT q_id, rn, vec_id, sim FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) AS sim,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * sqrt(list_inner_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))), 6) DESC,
                 c.vec_id) AS rn
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5) x
      WHERE rn <= 10 ORDER BY q_id, rn""",

    "ml_text_stats" -> """
      SELECT doc_id, len(string_split(text, ' ')) AS n_ws,
        len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9 ]')) AS n_sub,
        round(least(1.0, len(string_split(text, ' ')) / 50.0) * 0.4
          + (len(list_distinct(string_split(text, ' ')))::DOUBLE / len(string_split(text, ' '))) * 0.3
          + least(1.0, (list_sum(list_transform(string_split(text, ' '), w -> length(w)))::DOUBLE
                        / len(string_split(text, ' '))) / 8.0) * 0.3, 6) AS q,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(text, ' '),
            w -> CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT))),
          (acc, h) -> (acc * 1000003 + h) % 1000000000000) AS fp
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""",

    "ml_lang_id" -> """
      WITH p AS (
        SELECT lang,
          CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
               WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
               WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
               WHEN s_es > 0 THEN 'es'
               ELSE 'und' END AS pred
        FROM (
          SELECT lang, text,
            len(list_filter(string_split(lower(text), ' '),
              w -> list_contains(['the','a','of','and','to','in','is'], w))) AS s_en,
            len(list_filter(string_split(lower(text), ' '),
              w -> list_contains(['der','die','das','und','ist','ein'], w))) AS s_de,
            len(list_filter(string_split(lower(text), ' '),
              w -> list_contains(['le','la','les','et','est','un'], w))) AS s_fr,
            len(list_filter(string_split(lower(text), ' '),
              w -> list_contains(['el','los','las','y','es','una'], w))) AS s_es
          FROM documents) x)
      SELECT lang, pred, count(*) AS n FROM p
      GROUP BY lang, pred ORDER BY lang, pred""",

    "ml_multimodal_resize" -> """
      WITH d AS (
        SELECT doc_id, 'IMG0' AS format,
               CAST((octet_length(CAST(concat('IMG0', text) AS BLOB)) * 7) % 1920 + 1 AS INT) AS width,
               CAST((octet_length(CAST(concat('IMG0', text) AS BLOB)) * 13) % 1080 + 1 AS INT) AS height
        FROM documents WHERE doc_id < 100)
      SELECT doc_id, format, width, height,
             CAST(CASE WHEN width * 480 >= height * 640 THEN 640
                       ELSE (width * 480) // height END AS INT) AS rw,
             CAST(CASE WHEN width * 480 >= height * 640 THEN (height * 640) // width
                       ELSE 480 END AS INT) AS rh,
             CAST(CAST(CASE WHEN width * 480 >= height * 640 THEN 640
                            ELSE (width * 480) // height END AS BIGINT)
                  * CAST(CASE WHEN width * 480 >= height * 640 THEN (height * 640) // width
                              ELSE 480 END AS BIGINT) * 3 AS BIGINT) AS rbytes
      FROM d ORDER BY doc_id""",

    "ml_multimodal_meta" -> """
      SELECT doc_id, 'IMG0' AS fmt,
        CAST((octet_length(CAST(concat('IMG0', text) AS BLOB)) * 7) % 1920 + 1 AS INT) AS w,
        CAST((octet_length(CAST(concat('IMG0', text) AS BLOB)) * 13) % 1080 + 1 AS INT) AS h,
        octet_length(CAST(concat('IMG0', text) AS BLOB)) AS nb,
        array_to_string(list_transform(generate_series(0, 3),
          i -> i * (octet_length(CAST(concat('IMG0', text) AS BLOB)) // 4)), ',') AS offs
      FROM documents WHERE doc_id < 100 ORDER BY doc_id"""
    // ml_dedup_simhash, ml_ann_lsh: rows-only (engine-seeded hashes)
  )
}
