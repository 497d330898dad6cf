package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 fifth sweep:
  *  - Arrow IPC result roundtrip (MemoryScratchSink equivalent —
  *    serialize the result to Arrow record batches, rehydrate, prove
  *    losslessness against the direct computation);
  *  - BM25 ranking over the documents table (the reference's score()
  *    surface — function_score.cpp — re-expressed as a distributed
  *    TF/DF pipeline: tokenize -> per-doc TF -> broadcast DF/avgdl ->
  *    score; no inverted index, the scan IS the index at our scale,
  *    and every stage is a plain shuffle that scales horizontally).
  */
object Round4fQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Arrow roundtrip: result -> IPC batches -> DataFrame -> agg.
    // The oracle computes the same agg directly: hash-match proves the
    // columnar wire format preserved every value.
    "src_arrow_result" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      val res = s.sql("""
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey < 500""")
      val (schemaJson, batches) = graft.ops.ArrowResult.serialize(res)
      graft.ops.ArrowResult.deserialize(s, schemaJson, batches)
        .createOrReplaceTempView("arrow_rt")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n,
               CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
               min(c_name) AS mn
        FROM arrow_rt GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // BM25 (k1=1.2, b=0.75) for the fixed query {data, model} —
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5)), the Lucene form
    "ds_bm25" -> sql("""
      WITH toks AS (
        SELECT doc_id, tok
        FROM documents LATERAL VIEW explode(split(lower(text), ' +')) t AS tok
        WHERE tok != ''),
      dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             WHERE tok IN ('data', 'model') GROUP BY doc_id, tok),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
      scored AS (
        SELECT tf.doc_id,
               sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / s.avgdl))) AS score
        FROM tf JOIN df ON tf.tok = df.tok
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
        GROUP BY tf.doc_id)
      SELECT doc_id, round(score, 6) AS score
      FROM scored ORDER BY score DESC, doc_id LIMIT 10""")
  )

  def oracle: Map[String, String] = Map(
    "src_arrow_result" -> """
      SELECT c_mktsegment, count(*) AS n,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
             min(c_name) AS mn
      FROM customer WHERE c_custkey < 500
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "ds_bm25" -> """
      WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok
              FROM documents) z
        WHERE tok != ''),
      dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             WHERE tok IN ('data', 'model') GROUP BY doc_id, tok),
      df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY tok),
      scored AS (
        SELECT tf.doc_id,
               sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.len / s.avgdl))) AS score
        FROM tf JOIN df ON tf.tok = df.tok
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN stats s
        GROUP BY tf.doc_id)
      SELECT doc_id, round(score, 6) AS score
      FROM scored ORDER BY score DESC, doc_id LIMIT 10"""
  )
}
