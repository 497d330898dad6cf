package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 third sweep — IP / URL / MySQL-string / date-tail /
  * encode-decode scalar families (reference: function_ip.cpp, url/
  * family, function_string_misc.cpp, function_encode_varchar.cpp,
  * date_time_transforms.h tail names).
  */
object Round4cQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // IPv4 numeric family + error modes + CIDR (derived quads: the
    // oracle recomputes from c_custkey arithmetic)
    "misc_ip2" -> sql("""
      WITH t AS (
        SELECT c_custkey,
               concat(CAST(pmod(c_custkey, 11) AS STRING), '.',
                      CAST(pmod(c_custkey, 256) AS STRING), '.',
                      CAST(pmod(c_custkey * 7, 256) AS STRING), '.',
                      CAST(pmod(c_custkey * 13, 256) AS STRING)) AS ip
        FROM customer WHERE c_custkey < 300)
      SELECT c_custkey,
             inet_aton(ip) AS num,
             inet_ntoa(inet_aton(ip)) AS rt,
             ipv4_string_to_num_or_null(concat(ip, '.9')) AS bad_null,
             ipv4_string_to_num_or_default(concat(ip, '.9')) AS bad_dflt,
             is_ipv4(ip) AS ok,
             to_ipv4_or_null(ip) AS canon,
             to_ipv4_or_default(concat(ip, 'x')) AS dflt,
             concat(ipv4_cidr_to_range('10.0.0.0/8')._1, '|',
                    ipv4_cidr_to_range('10.0.0.0/8')._2) AS cidr,
             is_ip_address_in_range(ip, '10.0.0.0/8') AS in10
      FROM t ORDER BY c_custkey"""),

    // IPv6 binary family — pinned inet_pton-derived vectors
    "misc_ipv6_2" -> sql("""
      SELECT upper(hex(inet6_aton('192.168.1.1'))) AS aton4,
             inet6_ntoa(inet6_aton('2001:db8::1')) AS rt6,
             is_ipv4_mapped(inet6_aton('192.168.1.1')) AS mapped,
             is_ipv4_mapped(inet6_aton('2001:db8::1')) AS mapped_no,
             is_ipv4_compat(ipv6_string_to_num('::5')) AS compat,
             is_ipv4_compat(ipv6_string_to_num('::1')) AS compat_no,
             concat(ipv6_cidr_to_range('2001:db8::/32')._1, '|',
                    ipv6_cidr_to_range('2001:db8::/32')._2) AS cidr6,
             is_ip_address_in_range('2001:db8::1', '2001:db8::/32') AS in6,
             is_ip_address_in_range('2001:db9::1', '2001:db8::/32') AS out6,
             upper(hex(ipv6_from_uint128_string_or_null('1'))) AS u128,
             ipv6_from_uint128_string_or_null(
               '340282366920938463463374607431768211456') AS u128_over,
             to_ipv6_or_default('zz') AS dflt6,
             to_ipv6_or_null('FE80::0001') AS canon6,
             upper(hex(ipv6_string_to_num_or_default('zz'))) AS zero16"""),

    // URL family (ClickHouse-derived domain heuristics)
    "misc_url2" -> sql("""
      WITH t AS (
        SELECT c_custkey,
               concat('https://shard', CAST(c_nationkey AS STRING),
                      '.example.com/cust/', CAST(c_custkey AS STRING),
                      '?seg=', c_mktsegment, '&x=1') AS url
        FROM customer WHERE c_custkey < 200)
      SELECT c_custkey,
             protocol(url) AS proto,
             domain(url) AS dom,
             domain_without_www('https://www.example.org/x') AS no_www,
             top_level_domain(url) AS tld,
             first_significant_subdomain(url) AS fsd,
             cut_to_first_significant_subdomain(url) AS cut_fsd,
             first_significant_subdomain('https://news.clickhouse.com.tr/x') AS fsd2,
             cut_to_first_significant_subdomain('https://news.clickhouse.com.tr/x') AS cut2,
             extract_url_parameter(url, 'seg') AS seg,
             extract_url_parameter(url, 'zz') AS seg_null
      FROM t ORDER BY c_custkey"""),

    // MySQL string conveniences (strleft/strright/mid/insert/
    // append/money/export_set/make_set/field/format)
    "fn_string5" -> sql("""
      SELECT n_nationkey,
             strleft(n_name, 3) AS sl, strright(n_name, 2) AS sr,
             mid(n_name, 2, 4) AS md,
             mysql_insert(n_name, 2, 3, 'xyz') AS ins,
             append_trailing_char_if_absent(n_name, '1') AS app1,
             append_trailing_char_if_absent(n_name, 'Z') AS appz,
             money_format(CAST(n_nationkey * 1000 AS DOUBLE) + 0.25) AS mf,
             format_round(CAST(n_nationkey * 1000 AS DOUBLE) + 0.25, 2) AS fr,
             null_or_empty('') AS noe, not_null_or_empty(n_name) AS nnoe,
             export_set(CAST(n_nationkey AS BIGINT), 'Y', 'N', ',', 4) AS es,
             make_set(CAST(n_nationkey % 8 AS BIGINT), 'a', 'b', 'c') AS ms,
             CAST(field(n_name, 'NATION_3', 'NATION_7') AS BIGINT) AS fld,
             format('%02d-%s', CAST(n_nationkey AS INT), n_name) AS fmt
      FROM nation ORDER BY n_nationkey"""),

    // similarity / replace_empty / parse_data_size / normalization /
    // password — pinned where DuckDB has no analog
    "fn_strfuncs2" -> sql("""
      SELECT round(ngram_search('abcde', 'abcde', 3), 6) AS ng_eq,
             round(ngram_search('abcde', 'abcdf', 3), 6) AS ng_near,
             round(ngram_search('ab', 'abcdf', 3), 6) AS ng_short,
             edit_distance('kitten', 'sitting') AS ed,
             damerau_levenshtein_distance('ab', 'ba') AS dl1,
             damerau_levenshtein_distance('abc', 'acb') AS dl2,
             replace_empty('NATION', 'N', 'X') AS re1,
             replace_empty('ab', '', '-') AS re2,
             parse_data_size('1kB') AS pds1,
             parse_data_size('2.3MB') AS pds2,
             parse_data_size('17B') AS pds3,
             unicode_normalize('abc', 'NFC') AS un,
             length(convert_to('hello', 'utf-8')) AS conv_len,
             password('password') AS pw,
             round(normal_cdf(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE),
                              CAST(1.96 AS DOUBLE)), 6) AS ncdf,
             round(normal_cdf(CAST(0 AS DOUBLE), CAST(1 AS DOUBLE),
                              CAST(0 AS DOUBLE)), 6) AS ncdf0"""),

    // date/time tail names
    "fn_date4" -> sql("""
      SELECT event_id,
             dow(CAST(ts AS DATE)) AS dw,
             doy(CAST(ts AS DATE)) AS dy,
             century(CAST(ts AS DATE)) AS cen,
             CAST(previous_day(CAST(ts AS DATE), 'MONDAY') AS STRING) AS prevmon,
             yearweek(CAST(ts AS DATE)) AS yw,
             year_of_week(CAST(ts AS DATE)) AS yow_,
             yow(CAST(ts AS DATE)) AS yow2,
             hour_from_unixtime(3600 * 5 + event_id) AS hfu,
             minute_from_unixtime(3600 * 5 + event_id * 61) AS mfu,
             second_from_unixtime(event_id) AS sfu,
             maketime(9, 5, 3) AS mt,
             time_format(CAST(ts AS TIMESTAMP), '%H:%i') AS tf,
             unix_micros(add_time(CAST(ts AS TIMESTAMP), '01:02:03')) AS at,
             unix_micros(sub_time(CAST(ts AS TIMESTAMP), '01:02:03')) AS st,
             CAST(adddate(CAST(ts AS DATE), 40) AS STRING) AS ad,
             CAST(subdate(CAST(ts AS DATE), 40) AS STRING) AS sd,
             year_month(CAST(ts AS DATE)) AS ym
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    // encode/decode + binary + uuid + bit helpers
    "misc_encode" -> sql("""
      SELECT n_nationkey,
             encode_as_smallint('A') AS e16,
             encode_as_int('ab') AS e32,
             encode_as_bigint('NATION') AS e64,
             CAST(encode_as_largeint('NATION') AS STRING) AS e128,
             decode_as_varchar(encode_as_bigint(substring(n_name, 1, 7))) AS rt,
             CAST(sub_binary(CAST(n_name AS BINARY), 2, 3) AS STRING) AS sb,
             from_binary(CAST(n_name AS BINARY)) AS fb,
             to_hex(CAST('AB' AS BINARY)) AS th,
             CAST(from_hex('4142') AS STRING) AS fh,
             CAST(from_base64_binary(to_base64_binary(CAST(n_name AS BINARY))) AS STRING) AS b64rt,
             is_uuid('6ce4766f-6783-4b30-b357-bba1c7600348') AS isu,
             is_uuid('nope') AS isu_no,
             CAST(uuid_to_int('00000000-0000-0000-0000-000000000009') AS BIGINT) AS u2i,
             int_to_uuid(CAST(9 AS DECIMAL(38,0))) AS i2u,
             bit_test(CAST(5 AS BIGINT), 0) AS bt0,
             bit_test(CAST(5 AS BIGINT), 1) AS bt1,
             bit_test_all(CAST(5 AS BIGINT), 0, 2) AS bta,
             bit_shift_left(CAST(n_nationkey AS BIGINT), 3) AS bsl,
             bit_shift_right(CAST(n_nationkey * 100 AS BIGINT), 2) AS bsr,
             crc32_internal('hello') AS crc
      FROM nation ORDER BY n_nationkey"""),

    // scalar vector-similarity aliases over the embeddings fixture
    "fq_vector_sim" -> sql("""
      WITH p AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               transform(a.embedding, x -> CAST(x AS DOUBLE)) AS va,
               transform(b.embedding, x -> CAST(x AS DOUBLE)) AS vb
        FROM embeddings a JOIN embeddings b
          ON b.vec_id = a.vec_id + 1 AND a.vec_id < 50)
      SELECT ida,
             round(cosine_similarity(va, vb), 6) AS cs,
             round(inner_product_approximate(va, vb), 6) AS ipa,
             round(l2_distance_approximate(va, vb), 6) AS l2a
      FROM p ORDER BY ida""")
  )

  def oracle: Map[String, String] = Map(
    "misc_ip2" -> """
      WITH t AS (
        SELECT c_custkey,
               c_custkey % 11 AS p1, c_custkey % 256 AS p2,
               (c_custkey * 7) % 256 AS p3, (c_custkey * 13) % 256 AS p4
        FROM customer WHERE c_custkey < 300),
      u AS (SELECT *,
               p1 * 16777216 + p2 * 65536 + p3 * 256 + p4 AS num,
               concat(CAST(p1 AS VARCHAR), '.', CAST(p2 AS VARCHAR), '.',
                      CAST(p3 AS VARCHAR), '.', CAST(p4 AS VARCHAR)) AS ip
            FROM t)
      SELECT c_custkey,
             num, ip AS rt,
             CAST(NULL AS BIGINT) AS bad_null,
             CAST(0 AS BIGINT) AS bad_dflt,
             true AS ok,
             ip AS canon,
             '0.0.0.0' AS dflt,
             '10.0.0.0|10.255.255.255' AS cidr,
             p1 = 10 AS in10
      FROM u ORDER BY c_custkey""",

    "misc_ipv6_2" -> """
      SELECT '00000000000000000000FFFFC0A80101' AS aton4,
             '2001:db8::1' AS rt6,
             true AS mapped, false AS mapped_no,
             true AS compat, false AS compat_no,
             '2001:db8::|2001:db8:ffff:ffff:ffff:ffff:ffff:ffff' AS cidr6,
             true AS in6, false AS out6,
             '00000000000000000000000000000001' AS u128,
             CAST(NULL AS BLOB) AS u128_over,
             '::' AS dflt6,
             'fe80::1' AS canon6,
             '00000000000000000000000000000000' AS zero16""",

    "misc_url2" -> """
      WITH t AS (
        SELECT c_custkey,
               concat('shard', CAST(c_nationkey AS VARCHAR), '.example.com') AS host,
               c_mktsegment AS seg
        FROM customer WHERE c_custkey < 200)
      SELECT c_custkey,
             'https' AS proto,
             host AS dom,
             'example.org' AS no_www,
             'com' AS tld,
             'example' AS fsd,
             'example.com' AS cut_fsd,
             'clickhouse' AS fsd2,
             'clickhouse.com.tr' AS cut2,
             seg, CAST(NULL AS VARCHAR) AS seg_null
      FROM t ORDER BY c_custkey""",

    "fn_string5" -> """
      SELECT n_nationkey,
             left(n_name, 3) AS sl, right(n_name, 2) AS sr,
             substr(n_name, 2, 4) AS md,
             concat(substr(n_name, 1, 1), 'xyz', substr(n_name, 5)) AS ins,
             CASE WHEN ends_with(n_name, '1') THEN n_name
                  ELSE concat(n_name, '1') END AS app1,
             concat(n_name, 'Z') AS appz,
             concat(format('{:,}', n_nationkey * 1000), '.25') AS mf,
             concat(format('{:,}', n_nationkey * 1000), '.25') AS fr,
             true AS noe, true AS nnoe,
             concat_ws(',',
               CASE WHEN (n_nationkey >> 0) & 1 = 1 THEN 'Y' ELSE 'N' END,
               CASE WHEN (n_nationkey >> 1) & 1 = 1 THEN 'Y' ELSE 'N' END,
               CASE WHEN (n_nationkey >> 2) & 1 = 1 THEN 'Y' ELSE 'N' END,
               CASE WHEN (n_nationkey >> 3) & 1 = 1 THEN 'Y' ELSE 'N' END) AS es,
             coalesce(array_to_string([x FOR x IN ['a', 'b', 'c']
               IF ((n_nationkey % 8) >> (list_position(['a','b','c'], x) - 1)) & 1 = 1], ','), '') AS ms,
             CAST(coalesce(list_position(['NATION_3', 'NATION_7'], n_name), 0) AS BIGINT) AS fld,
             printf('%02d-%s', n_nationkey, n_name) AS fmt
      FROM nation ORDER BY n_nationkey""",

    "fn_strfuncs2" -> """
      SELECT 1.0 AS ng_eq, 0.666667 AS ng_near, 0.0 AS ng_short,
             CAST(3 AS INT) AS ed, CAST(1 AS INT) AS dl1, CAST(1 AS INT) AS dl2,
             'XATIOX' AS re1, '-a-b-' AS re2,
             CAST(1024 AS BIGINT) AS pds1, CAST(2411724 AS BIGINT) AS pds2,
             CAST(17 AS BIGINT) AS pds3,
             'abc' AS un, CAST(5 AS INT) AS conv_len,
             '*2470C0C06DEE42FD1618BB99005ADCA2EC9D1E19' AS pw,
             0.975002 AS ncdf, 0.5 AS ncdf0""",

    "fn_date4" -> """
      SELECT event_id,
             CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INT) AS dw,
             CAST(dayofyear(CAST(ts AS DATE)) AS INT) AS dy,
             CAST(ceil(year(CAST(ts AS DATE)) / 100.0) AS INT) AS cen,
             CAST(CAST(ts AS DATE)
                  - CAST((dayofweek(CAST(ts AS DATE)) + 5) % 7 + 1 AS INTEGER) AS VARCHAR) AS prevmon,
             CAST(CASE WHEN CAST(strftime(CAST(ts AS DATE), '%U') AS INT) = 0
                  THEN (year(CAST(ts AS DATE)) - 1) * 100
                       + CAST(strftime(make_date(year(CAST(ts AS DATE)) - 1, 12, 31), '%U') AS INT)
                  ELSE year(CAST(ts AS DATE)) * 100
                       + CAST(strftime(CAST(ts AS DATE), '%U') AS INT) END AS INT) AS yw,
             CAST(isoyear(CAST(ts AS DATE)) AS INT) AS yow_,
             CAST(isoyear(CAST(ts AS DATE)) AS INT) AS yow2,
             CAST(5 AS INT) AS hfu,
             CAST(minute(CAST(to_timestamp(3600 * 5 + event_id * 61) AS TIMESTAMP)) AS INT) AS mfu,
             CAST(second(CAST(to_timestamp(event_id) AS TIMESTAMP)) AS INT) AS sfu,
             '09:05:03' AS mt,
             strftime(CAST(ts AS TIMESTAMP), '%H:%M') AS tf,
             epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR
                      + INTERVAL 2 MINUTE + INTERVAL 3 SECOND) AS at,
             epoch_us(CAST(ts AS TIMESTAMP) - INTERVAL 1 HOUR
                      - INTERVAL 2 MINUTE - INTERVAL 3 SECOND) AS st,
             CAST(CAST(ts AS DATE) + 40 AS VARCHAR) AS ad,
             CAST(CAST(ts AS DATE) - 40 AS VARCHAR) AS sd,
             CAST(year(CAST(ts AS DATE)) * 100 + month(CAST(ts AS DATE)) AS INT) AS ym
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "misc_encode" -> """
      SELECT n_nationkey,
             CAST(8321 AS SMALLINT) AS e16,
             CAST(816906242 AS INT) AS e32,
             CAST(2819440441142214662 AS BIGINT) AS e64,
             '52009496248817192076889945182983684102' AS e128,
             substr(n_name, 1, 7) AS rt,
             substr(n_name, 2, 3) AS sb,
             n_name AS fb,
             '4142' AS th, 'AB' AS fh, n_name AS b64rt,
             true AS isu, false AS isu_no,
             CAST(9 AS BIGINT) AS u2i,
             '00000000-0000-0000-0000-000000000009' AS i2u,
             CAST(1 AS TINYINT) AS bt0, CAST(0 AS TINYINT) AS bt1,
             CAST(1 AS TINYINT) AS bta,
             n_nationkey * 8 AS bsl,
             CAST(n_nationkey * 100 / 4 AS BIGINT) AS bsr,
             CAST(907060870 AS BIGINT) AS crc
      FROM nation ORDER BY n_nationkey""",

    "fq_vector_sim" -> """
      WITH p AS (
        SELECT a.vec_id AS ida,
               list_transform(a.embedding, x -> CAST(x AS DOUBLE)) AS va,
               list_transform(b.embedding, x -> CAST(x AS DOUBLE)) AS vb
        FROM embeddings a JOIN embeddings b
          ON b.vec_id = a.vec_id + 1 AND a.vec_id < 50)
      SELECT ida,
             round(list_dot_product(va, vb) /
                   (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb))), 6) AS cs,
             round(list_dot_product(va, vb), 6) AS ipa,
             round(sqrt(list_sum(list_transform(list_zip(va, vb),
                   t -> (t[1] - t[2]) * (t[1] - t[2])))), 6) AS l2a
      FROM p ORDER BY ida"""
  )
}
