package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-6 surface: the `score()` SQL name (VERDICT r5 item 2) — the
  * reference registers `score` as a scalar (BuiltinScalarFunctions
  * .java, BE function_score.cpp) whose value is the BM25 relevance of
  * the row under the `search()` predicate in the same query block.
  * Here it is an analysis-time placeholder expanded by
  * [[graft.plans.ScoreRewriteRule]] into a per-row BM25 expression
  * whose corpus stats (N, avgdl, df per term) are uncorrelated scalar
  * subqueries — one tiny aggregate each, broadcast, single corpus scan
  * at any scale.
  */
object Round6Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // score() spelled in SQL, tokenize() token model (regex [^a-z0-9]+),
    // k1=1.2 b=0.75 Lucene idf — the function_score.cpp surface
    "search_score_sql" -> sql("""
      SELECT doc_id, round(score(), 6) AS relevance
      FROM documents
      WHERE search('text:slow text:merge text:window')
      ORDER BY relevance DESC, doc_id
      LIMIT 15""")
  )

  def oracle: Map[String, String] = Map(
    // same BM25, same operation order (literals 2.2/0.25 pre-folded the
    // way the rule folds k1+1 and 1-b), same rounding
    "search_score_sql" -> """
      WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> length(t) > 0) AS ts
        FROM documents),
      stats AS (SELECT CAST(count(1) AS DOUBLE) AS n_docs,
                       CAST(avg(len(ts)) AS DOUBLE) AS avgdl FROM d),
      dfs AS (SELECT
          CAST(count(*) FILTER (list_contains(ts, 'slow')) AS DOUBLE) AS df_slow,
          CAST(count(*) FILTER (list_contains(ts, 'merge')) AS DOUBLE) AS df_merge,
          CAST(count(*) FILTER (list_contains(ts, 'window')) AS DOUBLE) AS df_window
        FROM d),
      rows_matched AS (
        SELECT doc_id,
               CAST(len(ts) AS DOUBLE) AS dl,
               CAST(len(list_filter(ts, x -> x = 'slow')) AS DOUBLE) AS tf_slow,
               CAST(len(list_filter(ts, x -> x = 'merge')) AS DOUBLE) AS tf_merge,
               CAST(len(list_filter(ts, x -> x = 'window')) AS DOUBLE) AS tf_window
        FROM d
        WHERE list_contains(ts, 'slow') OR list_contains(ts, 'merge')
           OR list_contains(ts, 'window')),
      scored AS (
        SELECT doc_id,
          ((ln(1.0 + ((s.n_docs - f.df_slow) + 0.5) / (f.df_slow + 0.5))
              * ((tf_slow * 2.2) / (tf_slow + 1.2 * (0.25 + 0.75 * (dl / s.avgdl))))
            + ln(1.0 + ((s.n_docs - f.df_merge) + 0.5) / (f.df_merge + 0.5))
              * ((tf_merge * 2.2) / (tf_merge + 1.2 * (0.25 + 0.75 * (dl / s.avgdl)))))
            + ln(1.0 + ((s.n_docs - f.df_window) + 0.5) / (f.df_window + 0.5))
              * ((tf_window * 2.2) / (tf_window + 1.2 * (0.25 + 0.75 * (dl / s.avgdl))))) AS sc
        FROM rows_matched CROSS JOIN stats s CROSS JOIN dfs f)
      SELECT doc_id, round(sc, 6) AS relevance
      FROM scored ORDER BY relevance DESC, doc_id LIMIT 15"""
  )
}
