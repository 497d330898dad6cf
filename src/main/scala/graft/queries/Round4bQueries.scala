package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 JSON sweep — the reference's jsonb extraction/parse/
  * transform surface (function_jsonb.cpp, function_jsonb_transform.cpp,
  * function_to_json.cpp) with full nested-path + one-level-wildcard
  * semantics:
  *  - json_extract + typed variants (string/int/bigint/double/bool/
  *    isnull/largeint/no_quotes) and legacy get_json_*;
  *  - nested-path json_set/insert/replace/remove (MySQL no-op
  *    contract);
  *  - jsonb_parse error modes; sort_json_object_keys /
  *    normalize_json_numbers_to_double / json_object_flatten;
  *  - json_search (one/all, LIKE patterns);
  *  - variadic json_array / json_object / json_array_ignore_null.
  */
object Round4bQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // typed extraction over the events.props fixture column
    "fn_json_extract" -> sql("""
      SELECT event_id,
             json_extract(props, '$.k') AS jx,
             json_extract_int(props, '$.k') AS jxi,
             json_extract_bigint(props, '$.k') AS jxb,
             json_extract_double(props, '$.k') AS jxd,
             json_extract_isnull(props, '$.k') AS jxn,
             json_extract_largeint(props, '$.k') AS jxl,
             get_json_int(props, '$.k') AS gji,
             get_json_string(props, '$.k') AS gjs,
             json_extract_bool(props, '$.k') AS jxbool
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    // nested paths + wildcards over a controlled document
    "fn_json_nested" -> sql("""
      SELECT json_extract(d, '$.a.b[1]') AS e1,
             json_extract(d, '$.a.b[*]') AS e2,
             json_extract(d, '$.a.c') AS e3,
             json_extract_string(d, '$.a.c') AS e4,
             json_extract_isnull(d, '$.d') AS e5,
             json_exists_path(d, '$.a.b[2]') AS e6,
             json_exists_path(d, '$.a.b[9]') AS e7,
             json_type(d, '$.a.b') AS e8,
             json_type(d, '$.d') AS e9,
             json_length(d) AS e10,
             json_extract(d, '$.a.*') AS e11,
             jsonb_extract(d, '$.a.b[2]') AS e12
      FROM (SELECT '{"a":{"b":[1,2,3],"c":"x"},"d":null}' AS d)"""),

    // nested mutation + remove, MySQL contract
    "fn_json_mutate2" -> sql("""
      SELECT json_set('{"a":{"b":1}}', '$.a.b', '9') AS m1,
             json_set('{"a":{"b":1}}', '$.a.c', '"s"') AS m2,
             json_insert('{"a":{"b":1}}', '$.a.b', '9') AS m3,
             json_replace('{"a":{"b":1}}', '$.a.z', '9') AS m4,
             json_set('{"a":[1,2]}', '$.a[5]', '7') AS m5,
             json_set('{"a":[1,2]}', '$.a[0]', '7') AS m6,
             json_remove('{"a":{"b":1,"c":2}}', '$.a.b') AS m7,
             json_remove('[1,2,3]', '$[1]') AS m8,
             jsonb_set('{"a":1}', '$.a', '2') AS m9,
             json_remove('{"a":1}', '$.zzz') AS m10"""),

    "fn_json_parse" -> sql("""
      SELECT json_parse('{"a": 1, "b": [2,3]}') AS p1,
             json_parse_error_to_null('nope') AS p2,
             json_parse_error_to_value('nope', '{}') AS p3,
             jsonb_parse_error_to_null('[1,2') AS p4,
             jsonb_parse_error_to_value('[1,2', '[]') AS p5,
             json_parse_error_to_null('[1, 2]') AS p6"""),

    "fn_json_transform" -> sql("""
      SELECT sort_json_object_keys('{"b":1,"a":{"d":2,"c":3}}') AS t1,
             normalize_json_numbers_to_double('{"a":1,"b":[2,2.5]}') AS t2,
             json_object_flatten('{"a":{"b":2},"c":[{"d":1}],"e":5}') AS t3,
             json_search('{"a":"abc","b":{"c":"abd"}}', 'one', 'ab%') AS t4,
             json_search('{"a":"abc","b":{"c":"abd"}}', 'all', 'ab_') AS t5,
             json_search('{"a":"abc"}', 'all', 'zz%') AS t6,
             sort_jsonb_object_keys('[{"b":1,"a":2}]') AS t7,
             normalize_jsonb_numbers_to_double('7') AS t8"""),

    // variadic constructors (builders over to_json)
    "fn_json_construct" -> sql("""
      SELECT n_nationkey,
             json_array(1, 2, 3) AS a1,
             json_array_ignore_null(1, CAST(NULL AS INT), 3) AS a2,
             json_object('a', 1, 'b', 2) AS o1,
             json_object('x', n_nationkey) AS o2,
             jsonb_array(n_nationkey, n_regionkey) AS a3,
             jsonb_object('r', n_regionkey) AS o3
      FROM nation ORDER BY n_nationkey""")
  )

  def oracle: Map[String, String] = Map(
    "fn_json_extract" -> """
      SELECT event_id,
             CAST(json_extract(props, '$.k') AS VARCHAR) AS jx,
             CAST(json_extract(props, '$.k') AS INT) AS jxi,
             CAST(json_extract(props, '$.k') AS BIGINT) AS jxb,
             CAST(json_extract(props, '$.k') AS DOUBLE) AS jxd,
             false AS jxn,
             CAST(json_extract(props, '$.k') AS VARCHAR) AS jxl,
             CAST(json_extract(props, '$.k') AS INT) AS gji,
             CAST(json_extract(props, '$.k') AS VARCHAR) AS gjs,
             CAST(NULL AS BOOLEAN) AS jxbool
      FROM events
      WHERE event_id < 300 ORDER BY event_id""",

    "fn_json_nested" -> """
      SELECT '2' AS e1, '[1,2,3]' AS e2, '"x"' AS e3, 'x' AS e4,
             true AS e5, true AS e6, false AS e7, 'array' AS e8,
             'null' AS e9, CAST(2 AS BIGINT) AS e10,
             '[[1,2,3],"x"]' AS e11, '3' AS e12""",

    "fn_json_mutate2" -> """
      SELECT '{"a":{"b":9}}' AS m1,
             '{"a":{"b":1,"c":"s"}}' AS m2,
             '{"a":{"b":1}}' AS m3,
             '{"a":{"b":1}}' AS m4,
             '{"a":[1,2,7]}' AS m5,
             '{"a":[7,2]}' AS m6,
             '{"a":{"c":2}}' AS m7,
             '[1,3]' AS m8,
             '{"a":2}' AS m9,
             '{"a":1}' AS m10""",

    "fn_json_parse" -> """
      SELECT '{"a":1,"b":[2,3]}' AS p1,
             CAST(NULL AS VARCHAR) AS p2,
             '{}' AS p3,
             CAST(NULL AS VARCHAR) AS p4,
             '[]' AS p5,
             '[1,2]' AS p6""",

    "fn_json_transform" -> """
      SELECT '{"a":{"c":3,"d":2},"b":1}' AS t1,
             '{"a":1.0,"b":[2.0,2.5]}' AS t2,
             '{"a.b":2,"c":[{"d":1}],"e":5}' AS t3,
             '"$.a"' AS t4,
             '["$.a","$.b.c"]' AS t5,
             CAST(NULL AS VARCHAR) AS t6,
             '[{"a":2,"b":1}]' AS t7,
             '7.0' AS t8""",

    "fn_json_construct" -> """
      SELECT n_nationkey,
             '[1,2,3]' AS a1,
             '[1,3]' AS a2,
             '{"a":1,"b":2}' AS o1,
             concat('{"x":', CAST(n_nationkey AS VARCHAR), '}') AS o2,
             concat('[', CAST(n_nationkey AS VARCHAR), ',',
                    CAST(n_regionkey AS VARCHAR), ']') AS a3,
             concat('{"r":', CAST(n_regionkey AS VARCHAR), '}') AS o3
      FROM nation ORDER BY n_nationkey"""
  )
}
