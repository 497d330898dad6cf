package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Round-3 coverage sweep:
  *  - remaining Doris generators (vexplode_map.cpp,
  *    explode_json_array_{int,string} in
  *    nereids/.../functions/generator/, vexplode_bitmap.cpp);
  *  - JSON mutation family json_set/insert/replace + json_valid/type/
  *    length (function_jsonb.cpp) via graft.functions.JsonFunctions;
  *  - MySQL/Doris day-number + time-of-day + tz date functions
  *    (date_time_transforms.h) as Doris-named SQL UDFs;
  *  - topn_weighted (aggregate_function_topn.h) + Spark 4's native
  *    approx_top_k (the reference's approx heavy-hitter surface);
  *  - TABLESAMPLE (engine-specific sampling — rows-only).
  */
object Round3Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gen_explode_map" -> sql("""
      SELECT n_nationkey, mk, mv
      FROM nation
      LATERAL VIEW explode(map('nk', CAST(n_nationkey AS BIGINT),
                               'rk', CAST(n_regionkey AS BIGINT))) m AS mk, mv
      ORDER BY n_nationkey, mk"""),

    "gen_explode_json" -> sql("""
      WITH j AS (
        SELECT event_id,
               concat('[', CAST(event_id % 5 AS STRING), ',',
                      CAST(event_id % 7 AS STRING), ',',
                      CAST(event_id % 3 AS STRING), ']') AS arr,
               concat('["a', CAST(event_id % 4 AS STRING),
                      '","b', CAST(event_id % 2 AS STRING), '"]') AS sarr
        FROM events WHERE event_id < 200)
      SELECT event_id, CAST(pos AS BIGINT) AS pos, v,
             try_element_at(from_json(sarr, 'ARRAY<STRING>'), pos + 1) AS sv
      FROM j LATERAL VIEW posexplode(from_json(arr, 'ARRAY<BIGINT>')) t AS pos, v
      ORDER BY event_id, pos"""),

    "gen_explode_bitmap" -> sql("""
      WITH b AS (SELECT CAST(n_regionkey AS BIGINT) AS rk,
                        bitmap_agg(n_nationkey) AS bm
                 FROM nation GROUP BY n_regionkey)
      SELECT rk, explode(bitmap_to_array(bm)) AS nk
      FROM b ORDER BY rk, nk"""),

    "gen_explode_json_object" -> sql("""
      WITH j AS (
        SELECT event_id,
               concat('{"a":', CAST(event_id % 5 AS STRING),
                      ',"b":', CAST(event_id % 3 AS STRING), '}') AS doc
        FROM events WHERE event_id < 200)
      SELECT event_id, k, v
      FROM j LATERAL VIEW explode(from_json(doc, 'MAP<STRING,BIGINT>')) t AS k, v
      ORDER BY event_id, k"""),

    "fn_json_mutate" -> sql("""
      SELECT event_id,
             get_json_object(json_set(props, '$.k', '9'), '$.k') AS set_k,
             get_json_object(json_set(props, '$.x', '7'), '$.x') AS set_x,
             get_json_object(json_insert(props, '$.k', '9'), '$.k') AS ins_k,
             get_json_object(json_insert(props, '$.x', '7'), '$.x') AS ins_x,
             get_json_object(json_replace(props, '$.k', '9'), '$.k') AS rep_k,
             get_json_object(json_replace(props, '$.x', '7'), '$.x') AS rep_x,
             json_set('[1,2]', '$.k', '9') AS set_arr,
             json_replace(props, '$.a.b', '9') AS rep_nested,
             json_set(props, '$', '42') AS set_root,
             json_insert(props, '$', '42') AS ins_root,
             json_valid(props) AS jv,
             json_valid(concat('{', props)) AS jv_bad,
             json_type(props, '$') AS jt, json_type('[1,2]', '$') AS jt_arr,
             json_type('"s"', '$') AS jt_str, json_type('3.5', '$') AS jt_dbl,
             json_type(props, '$.k') AS jt_int,
             json_length(props) AS jl, json_length('[1,2,3]') AS jl_arr
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    "fn_date3" -> sql("""
      SELECT event_id,
             to_days(CAST(ts AS DATE)) AS td,
             CAST(from_days(to_days(CAST(ts AS DATE))) AS STRING) AS fd_rt,
             CAST(weekday(CAST(ts AS DATE)) AS BIGINT) AS wd,
             CAST(weekofyear(CAST(ts AS DATE)) AS BIGINT) AS woy,
             CAST(dayofyear(CAST(ts AS DATE)) AS BIGINT) AS doy,
             CAST(last_day(CAST(ts AS DATE)) AS STRING) AS ld,
             CAST(makedate(1996, CAST(event_id % 365 AS INT) + 1) AS STRING) AS md,
             date_format(convert_tz(ts, 'UTC', 'Asia/Shanghai'),
                         'yyyy-MM-dd HH:mm:ss') AS sh,
             sec_to_time(event_id * 37 % 86400) AS stt,
             time_to_sec(sec_to_time(event_id * 37 % 86400)) AS tts,
             unix_micros(timestampadd(MICROSECOND, 123456, ts)) AS micro_add
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    "agg_topn_weighted" -> sql("""
      SELECT l_returnflag,
             array_join(transform(
               topn_weighted5(CAST(l_partkey AS STRING), CAST(l_quantity AS BIGINT)),
               x -> concat(x.item, ':', CAST(x.cnt AS STRING))), '|') AS topw
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Spark 4 native approx sketch; maxItemsTracked=100 >= the 7
    // distinct linenumbers, so the sketch is exact and oracle-checkable
    "agg_approx_topk" -> sql("""
      SELECT array_join(transform(approx_top_k(l_linenumber, 3, 100),
               x -> concat(CAST(x.item AS STRING), ':', CAST(x.count AS STRING))), '|') AS top3
      FROM lineitem"""),

    // seeded Bernoulli sampling — the sampled ROW SET is engine-specific,
    // but the sampling CONTRACT is cross-engine checkable (r9-verdict
    // #9): the 10% sample's size rounds to exactly 0.1 of the table on
    // any engine whose sampler is unbiased (Bernoulli stddev at sf0.01's
    // 60k rows is ~0.12%, ~25 sigma inside the rounding bucket), keys
    // never exceed rows, and REPEATABLE(42) makes re-execution
    // identical (asserted in-engine). DuckDB mirrors all three from its
    // own seeded sample, so the driver's hash compare gates the
    // contract instead of a rows-only check.
    "src_tablesample" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      def sample() = s.sql("""
        SELECT count(*) AS n, count(DISTINCT l_orderkey) AS nk
        FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)""")
      val r = sample().head()
      val (n, nk) = (r.getLong(0), r.getLong(1))
      val r2 = sample().head()
      require(r2.getLong(0) == n && r2.getLong(1) == nk,
        s"REPEATABLE(42) re-execution differed: ($n,$nk) vs $r2")
      val total = s.table("lineitem").count()
      require(n >= total * 5 / 100 && n <= total * 15 / 100,
        s"seeded 10% sample out of [5%,15%] band: n=$n of $total")
      require(nk <= n, s"distinct keys $nk exceed sampled rows $n")
      s.sql("""
        SELECT round(CAST(count(*) AS DOUBLE)
                     / (SELECT count(*) FROM lineitem), 1) AS sample_ratio,
               count(DISTINCT l_orderkey) <= count(*) AS keys_bounded
        FROM lineitem TABLESAMPLE (10 PERCENT) REPEATABLE (42)""")
    })
  )

  def oracle: Map[String, String] = Map(
    "gen_explode_map" -> """
      SELECT n_nationkey, mk, mv FROM (
        SELECT n_nationkey, 'nk' AS mk, CAST(n_nationkey AS BIGINT) AS mv FROM nation
        UNION ALL
        SELECT n_nationkey, 'rk', CAST(n_regionkey AS BIGINT) FROM nation) u
      ORDER BY n_nationkey, mk""",

    "gen_explode_json" -> """
      WITH j AS (SELECT event_id FROM events WHERE event_id < 200),
      p AS (SELECT 0 AS pos UNION ALL SELECT 1 UNION ALL SELECT 2)
      SELECT event_id, CAST(pos AS BIGINT) AS pos,
             CASE pos WHEN 0 THEN event_id % 5
                      WHEN 1 THEN event_id % 7
                      ELSE event_id % 3 END AS v,
             CASE pos WHEN 0 THEN concat('a', CAST(event_id % 4 AS VARCHAR))
                      WHEN 1 THEN concat('b', CAST(event_id % 2 AS VARCHAR))
                      ELSE NULL END AS sv
      FROM j CROSS JOIN p ORDER BY event_id, pos""",

    "gen_explode_bitmap" -> """
      SELECT CAST(n_regionkey AS BIGINT) AS rk, n_nationkey AS nk
      FROM nation ORDER BY rk, nk""",

    "gen_explode_json_object" -> """
      SELECT event_id, k, v FROM (
        SELECT event_id, 'a' AS k, event_id % 5 AS v
        FROM events WHERE event_id < 200
        UNION ALL
        SELECT event_id, 'b', event_id % 3
        FROM events WHERE event_id < 200) u
      ORDER BY event_id, k""",

    "fn_json_mutate" -> """
      SELECT event_id,
             '9' AS set_k, '7' AS set_x,
             json_extract_string(props, '$.k') AS ins_k,
             '7' AS ins_x, '9' AS rep_k, CAST(NULL AS VARCHAR) AS rep_x,
             '[1,2]' AS set_arr,
             props AS rep_nested,
             '42' AS set_root,
             props AS ins_root,
             true AS jv, false AS jv_bad,
             'object' AS jt, 'array' AS jt_arr, 'string' AS jt_str, 'double' AS jt_dbl,
             'int' AS jt_int,
             CAST(1 AS BIGINT) AS jl, CAST(3 AS BIGINT) AS jl_arr
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "fn_date3" -> """
      SELECT event_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 719528 AS td,
             CAST(CAST(ts AS DATE) AS VARCHAR) AS fd_rt,
             CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS wd,
             CAST(weekofyear(CAST(ts AS DATE)) AS BIGINT) AS woy,
             CAST(dayofyear(CAST(ts AS DATE)) AS BIGINT) AS doy,
             CAST(last_day(CAST(ts AS DATE)) AS VARCHAR) AS ld,
             CAST(DATE '1996-01-01' + CAST(event_id % 365 AS INT) AS VARCHAR) AS md,
             strftime(CAST(ts AS TIMESTAMP) + INTERVAL 8 HOUR, '%Y-%m-%d %H:%M:%S') AS sh,
             concat(lpad(CAST((event_id * 37 % 86400) // 3600 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST(((event_id * 37 % 86400) % 3600) // 60 AS VARCHAR), 2, '0'), ':',
                    lpad(CAST((event_id * 37 % 86400) % 60 AS VARCHAR), 2, '0')) AS stt,
             CAST(event_id * 37 % 86400 AS BIGINT) AS tts,
             epoch_us(ts) + 123456 AS micro_add
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "agg_topn_weighted" -> """
      WITH w AS (SELECT l_returnflag, CAST(l_partkey AS VARCHAR) AS item,
                        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wsum
                 FROM lineitem GROUP BY 1, 2),
      r AS (SELECT l_returnflag, item, wsum,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY wsum DESC, item) AS rn
            FROM w)
      SELECT l_returnflag,
             string_agg(item || ':' || CAST(wsum AS VARCHAR), '|' ORDER BY rn) AS topw
      FROM r WHERE rn <= 5 GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_approx_topk" -> """
      WITH c AS (SELECT l_linenumber, count(*) AS n FROM lineitem GROUP BY 1)
      SELECT string_agg(CAST(l_linenumber AS VARCHAR) || ':' || CAST(n AS VARCHAR),
                        '|' ORDER BY n DESC, l_linenumber) AS top3
      FROM (SELECT * FROM c ORDER BY n DESC, l_linenumber LIMIT 3) t""",

    // each engine's own seeded 10% sample must round to 0.1 of the
    // table and never repeat a row (unbiased-sampler contract)
    "src_tablesample" -> """
      SELECT round(CAST(count(*) AS DOUBLE)
                   / (SELECT count(*) FROM lineitem), 1) AS sample_ratio,
             count(DISTINCT l_orderkey) <= count(*) AS keys_bounded
      FROM lineitem USING SAMPLE 10 PERCENT (bernoulli, 42)"""
  )
}
