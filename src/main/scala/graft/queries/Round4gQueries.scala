package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 final straggler sweep — every remaining reference function
  * name with testable semantics: MySQL EXTRACT-combo units, murmur
  * x64_128 lane family (pinned via the canonical commons-codec
  * implementation of the same public algorithm), JSON key/strip
  * helpers, get_format, planar st_distance, ai_* additions.
  */
object Round4gQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_date5" -> sql("""
      SELECT event_id,
             day_hour(CAST(ts AS TIMESTAMP)) AS dh,
             day_minute(CAST(ts AS TIMESTAMP)) AS dm,
             day_second(CAST(ts AS TIMESTAMP)) AS dsec,
             day_microsecond(CAST(ts AS TIMESTAMP)) AS dus,
             hour_minute(CAST(ts AS TIMESTAMP)) AS hm,
             hour_second(CAST(ts AS TIMESTAMP)) AS hs,
             hour_microsecond(CAST(ts AS TIMESTAMP)) AS hus,
             minute_second(CAST(ts AS TIMESTAMP)) AS msec,
             minute_microsecond(CAST(ts AS TIMESTAMP)) AS mus,
             second_microsecond(CAST(ts AS TIMESTAMP)) AS sus,
             get_format('DATE', 'USA') AS gf1,
             get_format('DATETIME', 'ISO') AS gf2,
             get_format('TIME', 'INTERNAL') AS gf3,
             round(dlog1(CAST(event_id + 1 AS DOUBLE)), 6) AS dl1
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    "fn_hash128" -> sql("""
      SELECT s,
             murmur_hash3_64_v2(s) AS h64v2,
             CAST(murmur_hash3_u64_v2(s) AS STRING) AS hu64v2,
             murmur_hash3_128(s) AS h128,
             murmur_hash3_u128(s) AS hu128
      FROM VALUES ('hello'), ('world'), ('abc') AS t(s) ORDER BY s"""),

    "fn_json3" -> sql("""
      SELECT json_keys('{"b":1,"a":{"c":2}}') AS jk,
             jsonb_keys('[1,2]') AS jk_arr,
             strip_null_value('{"a":1,"b":null,"c":"x"}') AS snv,
             variant_type('{"a":1}') AS vt_obj,
             variant_type('7') AS vt_int,
             json_hash('{"b":1,"a":2}') = json_hash('{"a":2,"b":1}') AS jh_keyorder,
             jsonb_hash('[1]') = json_hash('[1]') AS jh_same,
             concat_ws(',', multi_search_all_positions('NATION_THREE',
               array('ION', 'zz', 'N'))) AS msap,
             size(deduplicate_map(map('a', CAST(1 AS BIGINT),
                                      'b', CAST(2 AS BIGINT)))) AS ddm"""),

    "misc_ai2" -> sql("""
      SELECT doc_id,
             ai_extract(text, 'the') AS ex,
             ai_filter(text) AS flt,
             ai_fixgrammar(concat('  ', text, '  ')) AS fix,
             ai_generate(substring(text, 1, 10)) AS gen
      FROM documents WHERE doc_id < 50 ORDER BY doc_id"""),

    "geo_planar" -> sql("""
      SELECT round(st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0)), 6) AS d5,
             round(st_distance('POINT(1 1)', 'POINT(1 1)'), 6) AS d0,
             length(random_bytes(16)) AS rb_len,
             CAST(uuid_numeric() AS DECIMAL(38,0)) IS NOT NULL AS un_ok,
             sleep(CAST(0.0 AS DOUBLE)) AS sl,
             curtime() IS NOT NULL AS ct,
             schema() IS NOT NULL AS sc,
             upper(hex(st_asbinary('POINT(1 2)'))) AS wkb_pt,
             st_geometryfromwkb(st_asbinary('POINT(1.5 -2.5)')) AS wkb_rt,
             st_geomfromwkb(st_asbinary('LINESTRING(0 0, 1 1)')) AS wkb_ln"""),

    // lambda-first array composites + operator-name filter +
    // auto-partition naming + broadcast-map dict lookup
    "fn_array4" -> sql("""
      WITH d AS (SELECT n_nationkey,
                        array(CAST(n_nationkey % 3 AS BIGINT),
                              CAST(7 AS BIGINT),
                              CAST(n_nationkey % 3 AS BIGINT)) AS a
                 FROM nation)
      SELECT n_nationkey,
             size(array_filter(a, x -> x > 2)) AS cnt,
             element_at(array_filter(a, x -> x > 2), 1) AS fst,
             element_at(array_filter(a, x -> x >= 0), -1) AS lst,
             array_match_any2(x -> x = 7, a) AS fany,
             concat_ws(',', array_apply(a, '>=', CAST(3 AS BIGINT))) AS app,
             auto_partition_name('range', 'month', '2022-12-12 11:30:20') AS apn_m,
             auto_partition_name('range', 'hour', '2022-12-12 11:30:20') AS apn_h,
             auto_partition_name('list', 'Beijing', NULL) AS apn_l,
             auto_partition_name('list', '-x1', NULL) AS apn_neg,
             auto_partition_name_range('day', TIMESTAMP '2022-12-12 11:30:20') AS apn_r,
             dict_get(map('cn', 'China', 'us', 'USA'), 'cn') AS dg,
             concat_ws(',', dict_get_many(map('cn', 'China', 'us', 'USA'),
                                          array('us', 'cn'))) AS dgm
      FROM d ORDER BY n_nationkey""")
  )

  def oracle: Map[String, String] = Map(
    "fn_date5" -> """
      WITH t AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS tt
                 FROM events WHERE event_id < 300)
      SELECT event_id,
             day(tt) * 100 + hour(tt) AS dh,
             day(tt) * 10000 + hour(tt) * 100 + minute(tt) AS dm,
             day(tt) * 1000000 + hour(tt) * 10000 + minute(tt) * 100
               + CAST(floor(second(tt)) AS BIGINT) AS dsec,
             (day(tt) * 1000000 + hour(tt) * 10000 + minute(tt) * 100
               + CAST(floor(second(tt)) AS BIGINT)) * 1000000
               + epoch_us(tt) % 1000000 AS dus,
             hour(tt) * 100 + minute(tt) AS hm,
             hour(tt) * 10000 + minute(tt) * 100
               + CAST(floor(second(tt)) AS BIGINT) AS hs,
             (hour(tt) * 10000 + minute(tt) * 100
               + CAST(floor(second(tt)) AS BIGINT)) * 1000000
               + epoch_us(tt) % 1000000 AS hus,
             minute(tt) * 100 + CAST(floor(second(tt)) AS BIGINT) AS msec,
             (minute(tt) * 100 + CAST(floor(second(tt)) AS BIGINT)) * 1000000
               + epoch_us(tt) % 1000000 AS mus,
             CAST(floor(second(tt)) AS BIGINT) * 1000000
               + epoch_us(tt) % 1000000 AS sus,
             '%m.%d.%Y' AS gf1,
             '%Y-%m-%d %H:%i:%s' AS gf2,
             '%H%i%s' AS gf3,
             round(ln(CAST(event_id + 1 AS DOUBLE)), 6) AS dl1
      FROM t ORDER BY event_id""",

    "fn_hash128" -> """
      SELECT * FROM (VALUES
        ('abc', CAST(-5434086359492102041 AS BIGINT), '13012657714217449575',
         '79267961763742113019008347020647561319',
         '79267961763742113019008347020647561319'),
        ('hello', CAST(-3758069500696749310 AS BIGINT), '14688674573012802306',
         '121118445609844952839898260755277781762',
         '121118445609844952839898260755277781762'),
        ('world', CAST(8198091784597505258 AS BIGINT), '8198091784597505258',
         '-78565033930154308766756204499853146902',
         '261717332990784154696618402931915064554'))
        t(s, h64v2, hu64v2, h128, hu128)
      ORDER BY s""",

    "fn_json3" -> """
      SELECT '["b","a"]' AS jk,
             CAST(NULL AS VARCHAR) AS jk_arr,
             '{"a":1,"c":"x"}' AS snv,
             'object' AS vt_obj, 'int' AS vt_int,
             true AS jh_keyorder, true AS jh_same,
             '4,0,1' AS msap,
             2 AS ddm""",

    "misc_ai2" -> """
      SELECT doc_id,
             coalesce(array_to_string(list_filter(string_split(text, ' '),
               w -> contains(lower(w), 'the')), ' '), '') AS ex,
             CAST(concat('0x', substr(md5(text), 1, 4)) AS INT) % 2 = 0 AS flt,
             trim(regexp_replace(concat('  ', text, '  '), ' +', ' ', 'g')) AS fix,
             concat(substr(text, 1, 10), ' [generated]') AS gen
      FROM documents WHERE doc_id < 50 ORDER BY doc_id""",

    "geo_planar" -> """
      SELECT 5.0 AS d5, 0.0 AS d0,
             CAST(16 AS INT) AS rb_len,
             true AS un_ok, true AS sl, true AS ct, true AS sc,
             '0101000000000000000000F03F0000000000000040' AS wkb_pt,
             'POINT (1.5 -2.5)' AS wkb_rt,
             'LINESTRING (0 0, 1 1)' AS wkb_ln""",

    "fn_array4" -> """
      WITH d AS (SELECT n_nationkey,
                        n_nationkey % 3 AS m3
                 FROM nation)
      SELECT n_nationkey,
             CAST(1 + CASE WHEN m3 > 2 THEN 2 ELSE 0 END AS INT) AS cnt,
             CAST(7 AS BIGINT) AS fst,
             CAST(m3 AS BIGINT) AS lst,
             true AS fany,
             CASE WHEN m3 >= 3 THEN concat(CAST(m3 AS VARCHAR), ',7,', CAST(m3 AS VARCHAR))
                  ELSE '7' END AS app,
             'p20221201000000' AS apn_m,
             'p20221212110000' AS apn_h,
             'pBeijing' AS apn_l,
             'p_2dx1' AS apn_neg,
             'p20221212000000' AS apn_r,
             'China' AS dg, 'USA,China' AS dgm
      FROM d ORDER BY n_nationkey"""
  )
}
