package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** IP / URL / mask / search / dict / ai_* battery. Oracles mirror each
  * stub/bridge formula in DuckDB SQL (md5 + hex arithmetic are
  * identical across engines).
  */
object MiscQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "misc_ip" -> sql("""
      SELECT c_custkey, ip,
             ipv4_string_to_num(ip) AS ip_num,
             ipv4_num_to_string(ipv4_string_to_num(ip)) AS ip_rt,
             is_ipv4_string(ip) AS ok,
             is_ipv4_string(concat(ip, '.999')) AS bad,
             ipv4_cidr_contains('10.0.0.0/8', ip) AS in10
      FROM (SELECT c_custkey,
              concat(CAST(pmod(c_custkey, 11) AS STRING), '.',
                     CAST(pmod(c_custkey, 256) AS STRING), '.',
                     CAST(pmod(c_custkey * 7, 256) AS STRING), '.',
                     CAST(pmod(c_custkey * 13, 256) AS STRING)) AS ip
            FROM customer WHERE c_custkey < 300) t
      ORDER BY c_custkey"""),

    "misc_url" -> sql("""
      SELECT c_custkey,
             parse_url(url, 'PROTOCOL') AS proto,
             parse_url(url, 'HOST') AS host,
             parse_url(url, 'PATH') AS path,
             parse_url(url, 'QUERY', 'seg') AS seg
      FROM (SELECT c_custkey,
              concat('https://shard', CAST(c_nationkey AS STRING),
                     '.example.com/cust/', CAST(c_custkey AS STRING),
                     '?seg=', c_mktsegment, '&x=1') AS url
            FROM customer WHERE c_custkey < 200) t
      ORDER BY c_custkey"""),

    "misc_mask" -> sql("""
      SELECT n_nationkey, mask(concat(n_name, '-', CAST(n_nationkey AS STRING))) AS m,
             mask(n_name, 'U', 'l', '#') AS m2
      FROM nation ORDER BY n_nationkey"""),

    "misc_search" -> sql("""
      SELECT lang,
             count_if(match_any(text, 'slow fast')) AS n_any,
             count_if(match_all(text, 'slow fast')) AS n_all,
             count_if(match_phrase(text, 'slow fast')) AS n_phrase,
             count_if(size(tokenize(text)) > 50) AS n_long
      FROM documents GROUP BY lang ORDER BY lang"""),

    // global dictionary: built once from the dim table, broadcast to
    // every probe row (reference: dict_sink_operator.h:45 build +
    // function_dict_get.cpp lookup).
    "misc_dict" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      val dict = t(s, dir, "nation").collect()
        .map(r => r.getInt(0) -> r.getString(1)).toMap
      val bc = s.sparkContext.broadcast(dict)
      s.udf.register("dict_get_nation", (k: Int) => bc.value.getOrElse(k, null))
      s.sql("""
        SELECT dict_get_nation(c_nationkey) AS nation, count(*) AS n,
               count(DISTINCT c_custkey) AS nd
        FROM customer GROUP BY 1 ORDER BY 1""")
    }),

    // Doris-named alias surface (strleft/strright/append_trailing/
    // null_or_empty/dayname/monthname/money_format).
    "misc_doris_aliases" -> sql("""
      SELECT n_nationkey,
             strleft(n_name, 3) AS l3,
             strright(n_name, 3) AS r3,
             append_trailing_char_if_absent(n_name, 'A') AS app,
             null_or_empty(nullif(n_name, 'CHINA')) AS noe,
             not_null_or_empty(nullif(n_name, 'CHINA')) AS nnoe,
             dayname(DATE '2026-08-12') AS dn,   -- Spark builtin: 'Wed'
             monthname(DATE '2026-08-12') AS mn, -- Spark builtin: 'Aug'
             length(money_format(CAST(n_nationkey AS DOUBLE) * 1234.567)) > 0 AS mf_ok
      FROM nation ORDER BY n_nationkey"""),

    "misc_ai" -> sql("""
      SELECT doc_id,
             ai_sentiment(text) AS sent,
             ai_summarize(text, 5) AS summ,
             ai_classify(text, array('tech', 'sports', 'news')) AS cls,
             ai_mask(concat('id ', CAST(doc_id AS STRING), ' contact a', CAST(doc_id AS STRING), '@x.com ', substring(text, 1, 20))) AS masked,
             round(ai_similarity(text, 'data table query'), 6) AS sim,
             concat_ws(',', transform(embed(text),
               x -> CAST(CAST(round(x, 6) AS DECIMAL(9,6)) AS STRING))) AS emb
      FROM documents WHERE doc_id < 50 ORDER BY doc_id""")
  )

  private val num = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    "list_transform(string_split(%s, '.'), p -> CAST(p AS BIGINT))), (a, b) -> a * 256 + b)"

  def oracle: Map[String, String] = Map(
    "misc_ip" -> s"""
      SELECT c_custkey, ip, ${num.format("ip")} AS ip_num,
             concat(CAST((${num.format("ip")} >> 24) & 255 AS VARCHAR), '.',
                    CAST((${num.format("ip")} >> 16) & 255 AS VARCHAR), '.',
                    CAST((${num.format("ip")} >> 8) & 255 AS VARCHAR), '.',
                    CAST(${num.format("ip")} & 255 AS VARCHAR)) AS ip_rt,
             regexp_matches(ip, '^([0-9]{1,3}\\.){3}[0-9]{1,3}$$') AND
               len(list_filter(string_split(ip, '.'), p -> CAST(p AS INT) > 255)) = 0 AS ok,
             false AS bad,
             (${num.format("ip")} >> 24) = 10 AS in10
      FROM (SELECT c_custkey,
              concat(CAST(c_custkey % 11 AS VARCHAR), '.',
                     CAST(c_custkey % 256 AS VARCHAR), '.',
                     CAST((c_custkey * 7) % 256 AS VARCHAR), '.',
                     CAST((c_custkey * 13) % 256 AS VARCHAR)) AS ip
            FROM customer WHERE c_custkey < 300) t
      ORDER BY c_custkey""",

    "misc_url" -> """
      SELECT c_custkey,
             regexp_extract(url, '^([a-zA-Z]+):', 1) AS proto,
             regexp_extract(url, '^[a-zA-Z]+://([^/:?#]+)', 1) AS host,
             regexp_extract(url, '://[^/?#]*(/[^?#]*)', 1) AS path,
             regexp_extract(url, '[?&]seg=([^&#]*)', 1) AS seg
      FROM (SELECT c_custkey,
              concat('https://shard', CAST(c_nationkey AS VARCHAR),
                     '.example.com/cust/', CAST(c_custkey AS VARCHAR),
                     '?seg=', c_mktsegment, '&x=1') AS url
            FROM customer WHERE c_custkey < 200) t
      ORDER BY c_custkey""",

    "misc_mask" -> """
      SELECT n_nationkey,
             regexp_replace(regexp_replace(regexp_replace(
               concat(n_name, '-', CAST(n_nationkey AS VARCHAR)),
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS m,
             regexp_replace(regexp_replace(regexp_replace(
               n_name, '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '#', 'g') AS m2
      FROM nation ORDER BY n_nationkey""",

    "misc_search" -> """
      WITH tok AS (
        SELECT lang,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           t -> length(t) > 0) AS ts,
               lower(text) AS lt
        FROM documents)
      SELECT lang,
             CAST(count_if(len(list_intersect(ts, ['slow', 'fast'])) > 0) AS BIGINT) AS n_any,
             CAST(count_if(list_contains(ts, 'slow') AND list_contains(ts, 'fast')) AS BIGINT) AS n_all,
             CAST(count_if(instr(concat(' ', array_to_string(ts, ' '), ' '), ' slow fast ') > 0) AS BIGINT) AS n_phrase,
             CAST(count_if(len(ts) > 50) AS BIGINT) AS n_long
      FROM tok GROUP BY lang ORDER BY lang""",

    "misc_dict" -> """
      SELECT n_name AS nation, count(*) AS n, count(DISTINCT c_custkey) AS nd
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1 ORDER BY 1""",

    "misc_doris_aliases" -> """
      SELECT n_nationkey,
             n_name[1:3] AS l3,
             n_name[-3:] AS r3,
             CASE WHEN ends_with(n_name, 'A') THEN n_name ELSE concat(n_name, 'A') END AS app,
             nullif(n_name, 'CHINA') IS NULL OR nullif(n_name, 'CHINA') = '' AS noe,
             nullif(n_name, 'CHINA') IS NOT NULL AND nullif(n_name, 'CHINA') <> '' AS nnoe,
             dayname(DATE '2026-08-12')[1:3] AS dn,
             monthname(DATE '2026-08-12')[1:3] AS mn,
             true AS mf_ok
      FROM nation ORDER BY n_nationkey""",

    "misc_ai" -> """
      SELECT doc_id,
        ['positive', 'negative', 'neutral'][
          CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 3 + 1 AS INT)] AS sent,
        array_to_string(string_split(text, ' ')[1:5], ' ') AS summ,
        ['tech', 'sports', 'news'][
          CAST(CAST(concat('0x', substr(md5(text), 1, 4)) AS BIGINT) % 3 + 1 AS INT)] AS cls,
        regexp_replace(regexp_replace(
          concat('id ', CAST(doc_id AS VARCHAR), ' contact a', CAST(doc_id AS VARCHAR), '@x.com ', substr(text, 1, 20)),
          '[0-9]', '#', 'g'),
          '[a-zA-Z0-9.#_%+-]+@[a-zA-Z0-9.#-]+', '<email>', 'g') AS masked,
        round(len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                                 ['data', 'table', 'query']))::DOUBLE /
              len(list_distinct(list_concat(list_distinct(string_split(lower(text), ' ')),
                                 ['data', 'table', 'query']))), 6) AS sim,
        array_to_string(list_transform(generate_series(0, 7), i ->
          CAST(CAST(round((CAST(concat('0x', substr(md5(text), i * 4 + 1, 4)) AS BIGINT) - 32767.5) / 32767.5, 6)
               AS DECIMAL(9,6)) AS VARCHAR)), ',') AS emb
      FROM documents WHERE doc_id < 50 ORDER BY doc_id"""
  )
}
