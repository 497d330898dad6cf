package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** Battery exercising graft's custom function layer (bitmap algebra,
  * behavior analytics, vector distances, product/topn) against exact
  * SQL-expressible oracles. All queries run through spark.sql so the
  * registered SQL surface is what is tested.
  */
object FunctionQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fq_bitmap_basic" -> sql("""
      SELECT c_mktsegment,
             bitmap_count(bitmap_agg(c_custkey)) AS nd,
             bitmap_min(bitmap_agg(c_custkey)) AS mn,
             bitmap_max(bitmap_agg(c_custkey)) AS mx
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    "fq_bitmap_algebra" -> sql("""
      WITH r AS (SELECT c_nationkey, bitmap_agg(c_custkey) AS bm_rich
                 FROM customer WHERE c_acctbal > 5000 GROUP BY c_nationkey),
           b AS (SELECT c_nationkey, bitmap_agg(c_custkey) AS bm_bld
                 FROM customer WHERE c_mktsegment = 'BUILDING' GROUP BY c_nationkey)
      SELECT r.c_nationkey,
             bitmap_and_count(bm_rich, bm_bld) AS n_both,
             bitmap_or_count(bm_rich, bm_bld) AS n_any,
             bitmap_count(bitmap_andnot(bm_rich, bm_bld)) AS n_rich_only,
             bitmap_count(bitmap_xor(bm_rich, bm_bld)) AS n_sym
      FROM r JOIN b ON r.c_nationkey = b.c_nationkey
      ORDER BY r.c_nationkey"""),

    "fq_bitmap_array" -> sql("""
      SELECT n_regionkey,
             array_join(transform(bitmap_to_array(bitmap_agg(n_nationkey)),
                                  x -> CAST(x AS STRING)), '|') AS keys,
             bitmap_contains(bitmap_agg(n_nationkey), 3) AS has3
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // view -> click -> purchase funnel within 3 days per user
    // (reference: aggregate_function_window_funnel.*).
    "fq_window_funnel" -> sql("""
      SELECT user_id,
             window_funnel_3d(unix_micros(ts),
               CAST(event_type = 'view' AS INT)
               + 2 * CAST(event_type = 'click' AS INT)
               + 4 * CAST(event_type = 'purchase' AS INT)) AS lvl
      FROM events GROUP BY user_id ORDER BY user_id"""),

    "fq_retention" -> sql("""
      SELECT user_id,
             array_join(transform(
               retention3(CAST(event_type = 'signup' AS INT)
                 + 2 * CAST(event_type = 'click' AS INT)
                 + 4 * CAST(event_type = 'purchase' AS INT)),
               x -> CAST(x AS STRING)), '|') AS ret
      FROM events GROUP BY user_id ORDER BY user_id"""),

    "fq_sequence" -> sql("""
      SELECT user_id,
             sequence_match2(unix_micros(ts),
               CAST(event_type = 'signup' AS INT)
               + 2 * CAST(event_type = 'purchase' AS INT)) AS m_sp,
             sequence_count2(unix_micros(ts),
               CAST(event_type = 'view' AS INT)
               + 2 * CAST(event_type = 'click' AS INT)) AS c_vc
      FROM events GROUP BY user_id ORDER BY user_id"""),

    "fq_topn" -> sql("""
      SELECT lang,
             array_join(transform(topn5(word),
               x -> concat(x.item, ':', CAST(x.cnt AS STRING))), '|') AS top
      FROM (SELECT lang, explode(split(text, ' ')) AS word FROM documents) w
      GROUP BY lang ORDER BY lang"""),

    "fq_product" -> sql("""
      SELECT l_orderkey, round(product_agg(1.0 + l_tax), 6) AS p
      FROM lineitem WHERE l_orderkey < 100
      GROUP BY l_orderkey ORDER BY l_orderkey"""),

    "fq_vector_distance" -> sql("""
      SELECT a.vec_id,
             round(l2_distance(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 4) AS l2,
             round(l1_distance(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 4) AS l1,
             round(inner_product(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 4) AS ip,
             round(cosine_distance(CAST(a.embedding AS ARRAY<DOUBLE>), CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS cosd
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 100 ORDER BY a.vec_id""")
  )

  def oracle: Map[String, String] = Map(
    "fq_bitmap_basic" -> """
      SELECT c_mktsegment, count(DISTINCT c_custkey) AS nd,
             min(c_custkey) AS mn, max(c_custkey) AS mx
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "fq_bitmap_algebra" -> """
      SELECT c_nationkey,
             count(DISTINCT CASE WHEN c_acctbal > 5000 AND c_mktsegment = 'BUILDING' THEN c_custkey END) AS n_both,
             count(DISTINCT CASE WHEN c_acctbal > 5000 OR c_mktsegment = 'BUILDING' THEN c_custkey END) AS n_any,
             count(DISTINCT CASE WHEN c_acctbal > 5000 AND c_mktsegment <> 'BUILDING' THEN c_custkey END) AS n_rich_only,
             count(DISTINCT CASE WHEN (c_acctbal > 5000) <> (c_mktsegment = 'BUILDING') THEN c_custkey END) AS n_sym
      FROM customer
      GROUP BY c_nationkey
      HAVING count(DISTINCT CASE WHEN c_acctbal > 5000 THEN c_custkey END) > 0
         AND count(DISTINCT CASE WHEN c_mktsegment = 'BUILDING' THEN c_custkey END) > 0
      ORDER BY c_nationkey""",

    "fq_bitmap_array" -> """
      SELECT n_regionkey,
             array_to_string(list_sort(list(DISTINCT n_nationkey)), '|') AS keys,
             bool_or(n_nationkey = 3) AS has3
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "fq_window_funnel" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      l2 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 3 DAY),
      l3 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             JOIN events e3 ON e3.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e3.event_type = 'purchase'
               AND e2.ts > e1.ts AND e3.ts > e2.ts
               AND e3.ts <= e1.ts + INTERVAL 3 DAY)
      SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                  ELSE 0 END AS lvl
      FROM u ORDER BY u.user_id""",

    "fq_retention" -> """
      SELECT user_id,
             array_to_string([bool_or(event_type = 'signup'),
              bool_or(event_type = 'signup') AND bool_or(event_type = 'click'),
              bool_or(event_type = 'signup') AND bool_or(event_type = 'purchase')], '|') AS ret
      FROM events GROUP BY user_id ORDER BY user_id""",

    "fq_sequence" -> """
      WITH vc AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, CASE event_type WHEN 'view' THEN 1 ELSE 2 END) AS prev
        FROM events WHERE event_type IN ('view', 'click'))
      SELECT e.user_id,
             CAST(bool_or(EXISTS (
               SELECT 1 FROM events e1 JOIN events e2 ON e2.user_id = e1.user_id
               WHERE e1.user_id = e.user_id AND e1.event_type = 'signup'
                 AND e2.event_type = 'purchase' AND e2.ts > e1.ts)) AS BIGINT) AS m_sp,
             (SELECT CAST(coalesce(count_if(et.event_type = 'click' AND et.prev = 'view'), 0) AS BIGINT)
              FROM vc et WHERE et.user_id = e.user_id) AS c_vc
      FROM events e GROUP BY e.user_id ORDER BY e.user_id""",

    "fq_topn" -> """
      WITH w AS (SELECT lang, word, count(*) AS n FROM
                   (SELECT lang, unnest(string_split(text, ' ')) AS word
                    FROM documents) x
                 GROUP BY lang, word),
      r AS (SELECT lang, word, n,
                   row_number() OVER (PARTITION BY lang ORDER BY n DESC, word) AS rn
            FROM w)
      SELECT lang, string_agg(word || ':' || CAST(n AS VARCHAR), '|' ORDER BY rn) AS top
      FROM r WHERE rn <= 5 GROUP BY lang ORDER BY lang""",

    "fq_product" -> """
      SELECT l_orderkey, round(product(1.0 + l_tax), 6) AS p
      FROM lineitem WHERE l_orderkey < 100
      GROUP BY l_orderkey ORDER BY l_orderkey""",

    "fq_vector_distance" -> """
      SELECT a.vec_id,
             round(list_distance(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS l2,
             round(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]),
               (x, i) -> abs(x - CAST(b.embedding AS DOUBLE[])[i]))), 4) AS l1,
             round(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 4) AS ip,
             round(1.0 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cosd
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 100 ORDER BY a.vec_id"""
  )
}
