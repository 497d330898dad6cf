package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 first sweep — the remaining aggregate surface from
  * BuiltinAggregateFunctions.java:
  *  - map-valued key-wise aggregates sum_map/min_map/max_map/avg_map/
  *    count_map (functions/agg/{SumMap,MinMap,MaxMap,AvgMap,CountMap}
  *    .java);
  *  - group_array_intersect / group_array_union (GroupArrayIntersect
  *    .java);
  *  - bitmap_union_int / group_bitmap_xor (bitmap family tail);
  *  - sum0 / multi_distinct_sum0 / bool_xor / booland_agg / boolor_agg /
  *    corr_welford / group_uniq_array / median;
  *  - percentile_approx_weighted (exact over the weight-expanded
  *    multiset — cumulative-weight walk, no materialized expansion);
  *  - multi_distinct_group_concat (sorted canonicalization).
  */
object Round4Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // key-wise map aggregates; entries canonicalized sorted-by-key
    "agg_map_family" -> sql("""
      WITH d AS (
        SELECT n_regionkey,
               map('a', CAST(n_nationkey AS DOUBLE),
                   'b', CAST(n_nationkey % 3 AS DOUBLE)) AS m
        FROM nation)
      SELECT n_regionkey,
             concat_ws('|', transform(array_sort(map_keys(sum_map(m))),
               k -> concat(k, '=', CAST(round(element_at(sum_map(m), k), 6) AS STRING)))) AS sm,
             concat_ws('|', transform(array_sort(map_keys(min_map(m))),
               k -> concat(k, '=', CAST(round(element_at(min_map(m), k), 6) AS STRING)))) AS mnm,
             concat_ws('|', transform(array_sort(map_keys(max_map(m))),
               k -> concat(k, '=', CAST(round(element_at(max_map(m), k), 6) AS STRING)))) AS mxm,
             concat_ws('|', transform(array_sort(map_keys(avg_map(m))),
               k -> concat(k, '=', CAST(round(element_at(avg_map(m), k), 6) AS STRING)))) AS am,
             concat_ws('|', transform(array_sort(map_keys(count_map(m))),
               k -> concat(k, '=', CAST(element_at(count_map(m), k) AS STRING)))) AS cm
      FROM d GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // group-wide array intersection/union (sorted canonical arrays)
    "agg_array_setops" -> sql("""
      WITH d AS (
        SELECT n_regionkey,
               array(CAST(n_nationkey % 3 AS BIGINT), CAST(7 AS BIGINT),
                     CAST(n_nationkey % 5 AS BIGINT)) AS a
        FROM nation)
      SELECT n_regionkey,
             concat_ws(',', group_array_intersect(a)) AS gi,
             concat_ws(',', group_array_union(a)) AS gu
      FROM d GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // sum0 (0 not NULL on empty), distinct variant, boolean parity,
    // booland/boolor spellings, Welford corr, sorted distinct collect,
    // median
    "agg_sum0_bool" -> sql("""
      SELECT n_regionkey,
             sum0(IF(n_nationkey > 900, n_nationkey, NULL)) AS s0_empty,
             sum0(n_nationkey) AS s0,
             multi_distinct_sum0(n_nationkey % 3) AS mds0,
             bool_xor(n_nationkey % 2 = 0) AS bx,
             booland_agg(n_nationkey >= 0) AS ba,
             boolor_agg(n_nationkey > 22) AS bo,
             round(corr_welford(CAST(n_nationkey AS DOUBLE),
                                CAST(n_nationkey % 7 AS DOUBLE)), 6) AS cw,
             concat_ws(',', group_uniq_array(n_nationkey % 4)) AS gua,
             CAST(median(n_nationkey) AS DOUBLE) AS med
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // roaring tail: int-column distinct count + odd-occurrence xor
    "agg_bitmap_xor_int" -> sql("""
      WITH d AS (
        SELECT n_regionkey,
               bitmap_from_string(concat(CAST(n_nationkey % 5 AS STRING), ',',
                                         CAST(n_nationkey % 7 + 10 AS STRING))) AS bm,
               n_nationkey
        FROM nation)
      SELECT n_regionkey,
             bitmap_union_int(n_nationkey % 6) AS bui,
             bitmap_to_string(group_bitmap_xor(bm)) AS gbx
      FROM d GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // exact weighted percentile == percentile over w copies of v
    "agg_percentile_weighted" -> sql("""
      SELECT l_returnflag,
             round(percentile_weighted_p50(CAST(l_quantity AS DOUBLE),
                                           CAST(l_linenumber AS BIGINT)), 6) AS p50,
             round(percentile_weighted_p90(CAST(l_quantity AS DOUBLE),
                                           CAST(l_linenumber AS BIGINT)), 6) AS p90,
             round(percentile_approx_weighted(CAST(l_quantity AS DOUBLE),
                                              CAST(l_linenumber AS BIGINT),
                                              CAST(0.5 AS DOUBLE)), 6) AS paw50
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    "agg_multi_distinct_concat" -> sql("""
      SELECT c_nationkey,
             multi_distinct_group_concat(c_mktsegment) AS seg
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")
  )

  def oracle: Map[String, String] = Map(
    "agg_map_family" -> """
      WITH d AS (
        SELECT n_regionkey,
               CAST(n_nationkey AS DOUBLE) AS va,
               CAST(n_nationkey % 3 AS DOUBLE) AS vb
        FROM nation)
      SELECT n_regionkey,
             concat('a=', CAST(round(sum(va), 6) AS VARCHAR),
                    '|b=', CAST(round(sum(vb), 6) AS VARCHAR)) AS sm,
             concat('a=', CAST(round(min(va), 6) AS VARCHAR),
                    '|b=', CAST(round(min(vb), 6) AS VARCHAR)) AS mnm,
             concat('a=', CAST(round(max(va), 6) AS VARCHAR),
                    '|b=', CAST(round(max(vb), 6) AS VARCHAR)) AS mxm,
             concat('a=', CAST(round(avg(va), 6) AS VARCHAR),
                    '|b=', CAST(round(avg(vb), 6) AS VARCHAR)) AS am,
             concat('a=', CAST(count(*) AS VARCHAR),
                    '|b=', CAST(count(*) AS VARCHAR)) AS cm
      FROM d GROUP BY n_regionkey ORDER BY n_regionkey""",

    "agg_array_setops" -> """
      WITH d AS (
        SELECT n_regionkey, n_nationkey,
               [CAST(n_nationkey % 3 AS BIGINT), CAST(7 AS BIGINT),
                CAST(n_nationkey % 5 AS BIGINT)] AS a
        FROM nation),
      g AS (SELECT n_regionkey, count(*) AS n FROM d GROUP BY n_regionkey),
      u AS (SELECT d.n_regionkey, t.x, count(DISTINCT d.n_nationkey) AS c
            FROM d, unnest(d.a) AS t(x)
            GROUP BY d.n_regionkey, t.x)
      SELECT g.n_regionkey,
             coalesce((SELECT array_to_string(list_sort(list(DISTINCT u.x)), ',')
                       FROM u WHERE u.n_regionkey = g.n_regionkey AND u.c = g.n), '') AS gi,
             (SELECT array_to_string(list_sort(list(DISTINCT u.x)), ',')
              FROM u WHERE u.n_regionkey = g.n_regionkey) AS gu
      FROM g ORDER BY g.n_regionkey""",

    "agg_sum0_bool" -> """
      SELECT n_regionkey,
             CAST(0 AS BIGINT) AS s0_empty,
             CAST(sum(n_nationkey) AS BIGINT) AS s0,
             CAST(sum(DISTINCT n_nationkey % 3) AS BIGINT) AS mds0,
             count(*) FILTER (n_nationkey % 2 = 0) % 2 = 1 AS bx,
             bool_and(n_nationkey >= 0) AS ba,
             bool_or(n_nationkey > 22) AS bo,
             round(corr(CAST(n_nationkey AS DOUBLE),
                        CAST(n_nationkey % 7 AS DOUBLE)), 6) AS cw,
             array_to_string(list_sort(list(DISTINCT n_nationkey % 4)), ',') AS gua,
             CAST(median(n_nationkey) AS DOUBLE) AS med
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "agg_bitmap_xor_int" -> """
      WITH d AS (SELECT n_regionkey, n_nationkey FROM nation),
      vals AS (
        SELECT n_regionkey, n_nationkey, n_nationkey % 5 AS x FROM d
        UNION
        SELECT n_regionkey, n_nationkey, n_nationkey % 7 + 10 AS x FROM d),
      odd AS (SELECT n_regionkey, x FROM vals
              GROUP BY n_regionkey, x HAVING count(*) % 2 = 1)
      SELECT g.n_regionkey,
             (SELECT count(DISTINCT n_nationkey % 6) FROM d
              WHERE d.n_regionkey = g.n_regionkey) AS bui,
             coalesce((SELECT array_to_string(list_sort(list(x)), ',')
                       FROM odd WHERE odd.n_regionkey = g.n_regionkey), '') AS gbx
      FROM (SELECT DISTINCT n_regionkey FROM d) g ORDER BY g.n_regionkey""",

    "agg_percentile_weighted" -> """
      WITH expanded AS (
        SELECT l_returnflag, v FROM (
          SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS v,
                 unnest(generate_series(1, CAST(l_linenumber AS BIGINT)))
          FROM lineitem))
      SELECT l_returnflag,
             round(quantile_cont(v, 0.5), 6) AS p50,
             round(quantile_cont(v, 0.9), 6) AS p90,
             round(quantile_cont(v, 0.5), 6) AS paw50
      FROM expanded GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_multi_distinct_concat" -> """
      SELECT c_nationkey,
             string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS seg
      FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""
  )
}
