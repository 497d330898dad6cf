package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.SearchDsl

/** Round-5 first sweep: the search() DSL entry point + score()
  * (reference: function_search.h:46, SearchDslParser.java,
  * function_score.cpp — the documented way users query the inverted
  * index; here the DSL rewrites to match_* / tokenize predicates at
  * analysis time and score() is the BM25 pipeline).
  */
object Round5aQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // every clause type of the DSL grammar (SearchParser.g4) through
    // the SQL search() surface, each counted so one query pins all
    // twelve shapes: TERM, PREFIX, WILDCARD, REGEXP, PHRASE, RANGE,
    // IN, ANY, ALL, EXACT, boolean composition + field grouping, and
    // implicit adjacency (default operator OR)
    "search_dsl" -> sql("""
      SELECT count_if(search('text:slow')) AS n_term,
             count_if(search('text:slo*')) AS n_prefix,
             count_if(search('text:*as?')) AS n_wild,
             count_if(search('text:/f[ao]st/')) AS n_regex,
             count_if(search('text:"slow fast"')) AS n_phrase,
             count_if(search('n_chars:[300 TO 400]')) AS n_range,
             count_if(search('n_chars:{300 TO 400}')) AS n_range_ex,
             count_if(search('lang:IN(en de)')) AS n_in,
             count_if(search('text:ANY(slow fast)')) AS n_any,
             count_if(search('text:ALL(slow fast)')) AS n_all,
             count_if(search('lang:EXACT(en)')) AS n_exact,
             count_if(search('text:(slow OR fast) AND NOT lang:EXACT(zh)')) AS n_bool,
             count_if(search('text:slow text:fast')) AS n_adj
      FROM documents"""),

    // all 8 Doris lambda-first array composites under their own names
    // (LambdaArrays builders — single ArrayAggregate/ArraySort roots);
    // split results rendered as strings so DuckDB can replicate them
    // with window-numbered groups
    "fn_array_lambda_names" -> sql("""
      WITH d AS (
        SELECT n_nationkey,
               transform(sequence(1, CAST(n_nationkey % 5 + 2 AS INT)),
                         i -> CAST((i * (n_nationkey + 3)) % 7 AS BIGINT)) AS a
        FROM nation)
      SELECT n_nationkey,
             array_count(x -> x % 2 = 0, a) AS cnt,
             array_first(x -> x > 2, a) AS fst,
             array_last(x -> x > 2, a) AS lst,
             array_first_index(x -> x > 2, a) AS fidx,
             array_last_index(x -> x > 2, a) AS lidx,
             concat_ws(',', transform(array_sortby(x -> -x, a),
                                      v -> CAST(v AS STRING))) AS srt,
             concat_ws('|', transform(array_split(x -> x % 3 = 0, a),
               g -> concat_ws(',', transform(g, v -> CAST(v AS STRING))))) AS spl,
             concat_ws('|', transform(array_reverse_split(x -> x % 3 = 0, a),
               g -> concat_ws(',', transform(g, v -> CAST(v AS STRING))))) AS rspl
      FROM d ORDER BY n_nationkey"""),

    // the four remaining orthogonal_bitmap_* names under their own
    // spellings (aggregate_function_orthogonal_bitmap.cpp:59-61 +
    // util/bitmap_expr_calculation.h): intersect / intersect_count on
    // the canonical two-value form, expr_calculate(_count) with the
    // reference's equal-precedence left-assoc '&|^-' algebra
    "agg_named_orthogonal" -> sql("""
      WITH b AS (SELECT o_orderstatus AS f, to_bitmap(o_custkey) AS bm FROM orders)
      SELECT orthogonal_bitmap_intersect_count(bm, f, 'O', 'F') AS ic,
             bitmap_count(orthogonal_bitmap_intersect(bm, f, 'O', 'F')) AS ib_c,
             orthogonal_bitmap_expr_calculate_count(bm, f, '(O|P)&F') AS ec1,
             orthogonal_bitmap_expr_calculate_count(bm, f, '(O^P)-F') AS ec2,
             bitmap_count(orthogonal_bitmap_expr_calculate(bm, f, 'O&P&F')) AS ec3
      FROM b"""),

    // geo tail (functions_geo.cpp:557/923/959 + geo_tobinary.cpp):
    // st_touches (planar DE-9IM subset), st_numgeometries /
    // st_geometries over MULTI*/GEOMETRYCOLLECTION, polygon WKB io.
    // Literal oracle (DuckDB spatial unavailable offline).
    "geo_multi" -> sql("""
      SELECT st_touches('POINT(0 0)', 'LINESTRING(0 0, 1 1)') AS t_pt_end,
             st_touches('POINT(0.5 0.5)', 'LINESTRING(0 0, 1 1)') AS t_pt_mid,
             st_touches('POINT(1 0)', 'POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS t_pt_ring,
             st_touches('POINT(1 1)', 'POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))') AS t_pt_in,
             st_touches('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))',
                        'POLYGON((1 0, 2 0, 2 1, 1 1, 1 0))') AS t_shared_edge,
             st_touches('POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))',
                        'POLYGON((1 1, 3 1, 3 3, 1 3, 1 1))') AS t_overlap,
             st_touches('LINESTRING(0 0, 1 1)', 'LINESTRING(1 1, 2 0)') AS t_ln_end,
             st_touches('LINESTRING(0 0, 2 2)', 'LINESTRING(0 2, 2 0)') AS t_ln_cross,
             st_touches('LINESTRING(0 0, 2 0)', 'LINESTRING(1 0, 1 1)') AS t_ln_tee,
             st_touches('LINESTRING(0 0, 2 0)', 'LINESTRING(1 0, 3 0)') AS t_ln_overlap,
             st_touches('LINESTRING(0 0, 1 0)', 'LINESTRING(1 0, 2 0)') AS t_ln_chain,
             st_numgeometries('MULTIPOINT (1 2, 3 4)') AS ng_mp,
             st_numgeometries('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((2 2, 3 2, 3 3, 2 2)))') AS ng_mpoly,
             st_numgeometries('GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))') AS ng_gc,
             st_numgeometries('POINT (5 6)') AS ng_simple,
             concat_ws('|', st_geometries('MULTIPOINT ((1 2), (3 4))')) AS g_mp,
             concat_ws('|', st_geometries('GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))')) AS g_gc,
             st_geomfromwkb(st_asbinary('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))')) AS wkb_poly,
             upper(hex(st_asbinary('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'))) AS wkb_poly_hex"""),

    // the scoring path: score() = BM25 (k1=1.2, b=0.75, Lucene idf)
    // over the search terms, top-15
    "search_score" -> ((s, dir) => {
      SearchDsl.score(Q.t(s, dir, "documents"), "doc_id", "text",
          "slow merge window")
        .select(col("id").as("doc_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(15)
    })
  )

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> length(t) > 0)"

  def oracle: Map[String, String] = Map(
    "search_dsl" -> s"""
      WITH d AS (SELECT *, $toksSql AS ts FROM documents)
      SELECT count(*) FILTER (list_contains(ts, 'slow')) AS n_term,
             count(*) FILTER (len(list_filter(ts, t -> starts_with(t, 'slo'))) > 0) AS n_prefix,
             count(*) FILTER (len(list_filter(ts, t -> t LIKE '%as_')) > 0) AS n_wild,
             count(*) FILTER (len(list_filter(ts, t -> regexp_matches(t, 'f[ao]st'))) > 0) AS n_regex,
             count(*) FILTER (position(' slow fast ' IN ' ' || array_to_string(ts, ' ') || ' ') > 0) AS n_phrase,
             count(*) FILTER (CAST(n_chars AS DOUBLE) >= 300 AND CAST(n_chars AS DOUBLE) <= 400) AS n_range,
             count(*) FILTER (CAST(n_chars AS DOUBLE) > 300 AND CAST(n_chars AS DOUBLE) < 400) AS n_range_ex,
             count(*) FILTER (list_has_any(
               list_filter(string_split_regex(lower(lang), '[^a-z0-9]+'), t -> length(t) > 0),
               ['en', 'de'])) AS n_in,
             count(*) FILTER (list_has_any(ts, ['slow', 'fast'])) AS n_any,
             count(*) FILTER (list_contains(ts, 'slow') AND list_contains(ts, 'fast')) AS n_all,
             count(*) FILTER (lang = 'en') AS n_exact,
             count(*) FILTER ((list_contains(ts, 'slow') OR list_contains(ts, 'fast'))
                              AND NOT lang = 'zh') AS n_bool,
             count(*) FILTER (list_contains(ts, 'slow') OR list_contains(ts, 'fast')) AS n_adj
      FROM d""",

    "fn_array_lambda_names" -> """
      WITH d AS (
        SELECT n_nationkey,
               list_transform(generate_series(1, CAST(n_nationkey % 5 + 2 AS INT)),
                              i -> CAST((i * (n_nationkey + 3)) % 7 AS BIGINT)) AS a
        FROM nation),
      idx AS (
        SELECT n_nationkey,
               list_filter(list_transform(generate_series(1, len(a)),
                           i -> CASE WHEN a[i] > 2 THEN i ELSE NULL END),
                           v -> v IS NOT NULL) AS hits
        FROM d),
      elems AS (
        SELECT d.n_nationkey, i, a[i] AS x,
               sum(CASE WHEN a[i] % 3 = 0 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY d.n_nationkey ORDER BY i) AS g_incl
        FROM d, unnest(generate_series(1, len(a))) AS t(i)),
      e2 AS (SELECT *, g_incl - (CASE WHEN x % 3 = 0 THEN 1 ELSE 0 END) AS g_excl FROM elems),
      spl AS (SELECT n_nationkey, string_agg(s, '|' ORDER BY g) AS spl FROM (
                SELECT n_nationkey, g_incl AS g,
                       string_agg(CAST(x AS VARCHAR), ',' ORDER BY i) AS s
                FROM e2 GROUP BY n_nationkey, g_incl) z GROUP BY n_nationkey),
      rspl AS (SELECT n_nationkey, string_agg(s, '|' ORDER BY g) AS rspl FROM (
                SELECT n_nationkey, g_excl AS g,
                       string_agg(CAST(x AS VARCHAR), ',' ORDER BY i) AS s
                FROM e2 GROUP BY n_nationkey, g_excl) z GROUP BY n_nationkey)
      SELECT d.n_nationkey,
             CAST(len(list_filter(a, x -> x % 2 = 0)) AS BIGINT) AS cnt,
             list_filter(a, x -> x > 2)[1] AS fst,
             list_filter(a, x -> x > 2)[-1] AS lst,
             CAST(coalesce(list_min(idx.hits), 0) AS BIGINT) AS fidx,
             CAST(coalesce(list_max(idx.hits), 0) AS BIGINT) AS lidx,
             array_to_string(list_reverse(list_sort(a)), ',') AS srt,
             spl.spl, rspl.rspl
      FROM d JOIN idx USING (n_nationkey) JOIN spl USING (n_nationkey)
             JOIN rspl USING (n_nationkey)
      ORDER BY n_nationkey""",

    "geo_multi" -> """
      SELECT true AS t_pt_end, false AS t_pt_mid, true AS t_pt_ring,
             false AS t_pt_in, true AS t_shared_edge, false AS t_overlap,
             true AS t_ln_end, false AS t_ln_cross, true AS t_ln_tee,
             false AS t_ln_overlap, true AS t_ln_chain,
             CAST(2 AS BIGINT) AS ng_mp, CAST(2 AS BIGINT) AS ng_mpoly,
             CAST(2 AS BIGINT) AS ng_gc, CAST(1 AS BIGINT) AS ng_simple,
             'POINT (1 2)|POINT (3 4)' AS g_mp,
             'POINT (1 2)|LINESTRING (0 0, 1 1)' AS g_gc,
             'POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))' AS wkb_poly,
             '0103000000010000000500000000000000000000000000000000000000000000000000F03F0000000000000000000000000000F03F000000000000F03F0000000000000000000000000000F03F00000000000000000000000000000000' AS wkb_poly_hex""",

    "agg_named_orthogonal" -> """
      WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'),
           n AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'),
           r AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F')
      SELECT (SELECT count(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM r) x) AS ic,
             (SELECT count(*) FROM (SELECT k FROM a INTERSECT SELECT k FROM r) x) AS ib_c,
             (SELECT count(*) FROM (
                SELECT k FROM (SELECT k FROM a UNION SELECT k FROM n) u
                INTERSECT SELECT k FROM r) x) AS ec1,
             (SELECT count(*) FROM (
                SELECT k FROM (
                  SELECT k FROM (SELECT k FROM a UNION SELECT k FROM n) u
                  EXCEPT SELECT k FROM (SELECT k FROM a INTERSECT SELECT k FROM n) i) sym
                EXCEPT SELECT k FROM r) x) AS ec2,
             (SELECT count(*) FROM (
                SELECT k FROM a INTERSECT SELECT k FROM n INTERSECT SELECT k FROM r) x) AS ec3""",

    "search_score" -> """
      WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok
              FROM documents) z
        WHERE tok != ''),
      dl AS (SELECT doc_id, count(*) AS len FROM toks GROUP BY doc_id),
      stats AS (SELECT count(*) AS n_docs, avg(len) AS avgdl FROM dl),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
             WHERE tok IN ('slow', 'merge', 'window') GROUP BY doc_id, tok),
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
      FROM scored ORDER BY score DESC, doc_id LIMIT 15"""
  )
}
