package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 fourth sweep — array/struct/map name tail + bitmap &
  * quantile-state constructors (function_array_*.cpp, function_bitmap
  * .cpp bitmap_empty/bitmap_not/bitmap_from_array/to_bitmap_with_check,
  * quantile_state codecs, hll_raw_agg).
  */
object Round4dQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_array3" -> sql("""
      WITH d AS (SELECT n_nationkey,
                        array(CAST(n_nationkey AS BIGINT),
                              CAST(n_nationkey % 3 AS BIGINT),
                              CAST(2 AS BIGINT)) AS a
                 FROM nation)
      SELECT n_nationkey,
             to_json(array_zip(a, array('x', 'y', 'z'))) AS zip_j,
             concat_ws(',', array_flatten(array(a, array(CAST(9 AS BIGINT))))) AS flat,
             array_sort(array_shuffle(a)) = array_sort(a) AS shuffle_perm,
             array_match_all(x -> x >= 0, a) AS all_pos,
             array_match_any(x -> x > 90, a) AS any_big,
             array_contains_all(a, array(CAST(2 AS BIGINT))) AS has2,
             array_contains_all(a, array(CAST(99 AS BIGINT))) AS has99,
             concat_ws(',', array_reverse_sort(a)) AS rsort,
             concat_ws(',', transform(array_cross_product(
               array(CAST(1 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)),
               array(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE), CAST(0 AS DOUBLE))),
               x -> CAST(CAST(x AS BIGINT) AS STRING))) AS cross3,
             struct_element(named_struct('p', n_nationkey, 'q', n_name), 'q') AS se,
             map_contains_entry(map('k', CAST(n_nationkey AS BIGINT)), 'k',
                                CAST(n_nationkey AS BIGINT)) AS mce,
             map_contains_entry(map('k', CAST(n_nationkey AS BIGINT)), 'k',
                                CAST(-1 AS BIGINT)) AS mce_no,
             multi_match_any(n_name, array('^NATION', 'zzz')) AS mma,
             multi_match(n_name, array('^zz$')) AS mm_no
      FROM d JOIN nation USING (n_nationkey) ORDER BY n_nationkey"""),

    "state_bitmap2" -> sql("""
      SELECT n_regionkey,
             bitmap_count(bitmap_empty()) AS empty_n,
             bitmap_to_string(bitmap_not(bitmap_from_string('1,2,3'),
                                         bitmap_from_string('2'))) AS bnot,
             bitmap_to_string(bitmap_from_array(
               array(CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                     CAST(n_regionkey AS BIGINT)))) AS bfa,
             bitmap_count(to_bitmap_with_check(CAST(n_regionkey AS BIGINT))) AS tbc
      FROM (SELECT DISTINCT n_regionkey FROM nation) t ORDER BY n_regionkey"""),

    // quantile-state base64 roundtrip + empty state + hll_raw_agg
    // two-level union (shard -> merge), exact-in-sparse oracle
    "state_quantile3" -> sql("""
      WITH shard AS (
        SELECT l_returnflag, pmod(l_orderkey, 4) AS sh,
               to_quantile_state(CAST(l_quantity AS DOUBLE)) AS qs,
               hll_sketch_agg(l_suppkey) AS hs
        FROM lineitem GROUP BY l_returnflag, pmod(l_orderkey, 4))
      SELECT l_returnflag,
             round(quantile_percent(quantile_state_from_base64(
               quantile_state_to_base64(quantile_union(qs))), CAST(0.5 AS DOUBLE)), 6) AS p50,
             length(quantile_state_empty()) AS empty_len,
             hll_sketch_estimate(hll_raw_agg(hs)) AS ndv_supp
      FROM shard GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  def oracle: Map[String, String] = Map(
    "fn_array3" -> """
      WITH d AS (SELECT n_nationkey, n_name,
                        [n_nationkey, n_nationkey % 3, 2] AS a
                 FROM nation)
      SELECT n_nationkey,
             concat('[{"a":', CAST(a[1] AS VARCHAR), ',"1":"x"},{"a":',
                    CAST(a[2] AS VARCHAR), ',"1":"y"},{"a":',
                    CAST(a[3] AS VARCHAR), ',"1":"z"}]') AS zip_j,
             concat(array_to_string(a, ','), ',9') AS flat,
             true AS shuffle_perm,
             true AS all_pos, false AS any_big,
             true AS has2, false AS has99,
             array_to_string(list_reverse_sort(a), ',') AS rsort,
             '0,0,1' AS cross3,
             n_name AS se,
             true AS mce, false AS mce_no,
             true AS mma, false AS mm_no
      FROM d ORDER BY n_nationkey""",

    "state_bitmap2" -> """
      SELECT n_regionkey,
             CAST(0 AS BIGINT) AS empty_n,
             '1,3' AS bnot,
             array_to_string(list_sort(list_distinct([3, 1, 2, n_regionkey])), ',') AS bfa,
             CAST(1 AS BIGINT) AS tbc
      FROM (SELECT DISTINCT n_regionkey FROM nation) t ORDER BY n_regionkey""",

    "state_quantile3" -> """
      SELECT l_returnflag,
             round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
             CAST(0 AS INT) AS empty_len,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS ndv_supp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
