package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Round-3 second sweep — training-pipeline composition ops + remaining
  * string/codec scalar families:
  *  - duplicate-cluster resolution: near-dup pair graph -> connected
  *    components -> one canonical survivor per cluster (the step after
  *    every pairwise dedup in a real pipeline);
  *  - deterministic hash-based train/test split (md5 is engine-stable,
  *    so the split is reproducible anywhere);
  *  - embedding post-processing: L2 norm + int8 max-abs quantization;
  *  - hamming_distance / multi_search_all_positions
  *    (function_hamming_distance.cpp, functions_multi_string_position
  *    .cpp);
  *  - compress/uncompress roundtrip (function_compress.cpp).
  */
object Round3bQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // near-dup graph from two overlapping 3-word fingerprint windows
    // (chains across windows make components genuinely transitive),
    // resolved by iterative min-label propagation (ops.Dedup).
    "ml_dedup_components" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      val f = s.sql("""
        SELECT doc_id,
               md5(concat_ws(' ', slice(split(text, ' '), 1, 3))) AS k1,
               md5(concat_ws(' ', slice(split(text, ' '), 3, 3))) AS k2
        FROM documents WHERE size(split(text, ' ')) >= 5""")
      f.createOrReplaceTempView("fp_r3")
      val pairs = s.sql("""
        SELECT a.doc_id AS ida, b.doc_id AS idb
        FROM fp_r3 a JOIN fp_r3 b ON a.k1 = b.k1 AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id
        FROM fp_r3 a JOIN fp_r3 b ON a.k2 = b.k2 AND a.doc_id < b.doc_id""")
      graft.ops.Dedup.connectedComponents(pairs, "ida", "idb")
        .groupBy(col("lab"))
        .agg(count(lit(1)).as("sz"), max(col("id")).as("mx"))
        .orderBy(col("lab"))
    }),

    // the full training-corpus pipeline in one verified flow:
    // length filter -> exact dedup (min id per md5) -> near-dup pair
    // graph -> connected components -> one canonical survivor per
    // cluster -> deterministic split -> per-split token accounting.
    // Every stage shards (hash-group / shuffle-join / O(diameter)
    // label rounds); the oracle replays the identical pipeline with a
    // recursive closure for the component labels.
    "ml_pipeline_e2e" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        WITH c AS (SELECT doc_id, lang, text FROM documents
                   WHERE size(split(text, ' ')) >= 5),
        keep AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY md5(text))
        SELECT c.doc_id, c.lang, c.text FROM c JOIN keep USING (doc_id)""")
        .createOrReplaceTempView("surv_e2e")
      s.sql("""
        SELECT doc_id,
               md5(concat_ws(' ', slice(split(text, ' '), 1, 3))) AS k1,
               md5(concat_ws(' ', slice(split(text, ' '), 3, 3))) AS k2
        FROM surv_e2e""").createOrReplaceTempView("fp_e2e")
      val pairs = s.sql("""
        SELECT a.doc_id AS ida, b.doc_id AS idb
        FROM fp_e2e a JOIN fp_e2e b ON a.k1 = b.k1 AND a.doc_id < b.doc_id
        UNION
        SELECT a.doc_id, b.doc_id
        FROM fp_e2e a JOIN fp_e2e b ON a.k2 = b.k2 AND a.doc_id < b.doc_id""")
      graft.ops.Dedup.connectedComponents(pairs, "ida", "idb")
        .createOrReplaceTempView("cc_e2e")
      s.sql("""
        WITH reps AS (
          SELECT s.doc_id, s.lang, s.text FROM surv_e2e s
          LEFT JOIN cc_e2e c ON s.doc_id = c.id
          WHERE c.id IS NULL OR c.lab = s.doc_id),
        sp AS (SELECT doc_id, lang, size(split(text, ' ')) AS toks,
                      CASE WHEN pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6),
                                               16, 10) AS BIGINT), 100) < 80
                           THEN 'train' ELSE 'test' END AS split
               FROM reps)
        SELECT lang, split, count(*) AS n, CAST(sum(toks) AS BIGINT) AS total_toks,
               min(doc_id) AS mn, max(doc_id) AS mx
        FROM sp GROUP BY lang, split ORDER BY lang, split""")
    }),

    "ml_train_test_split" -> sql("""
      SELECT lang, split, count(*) AS n, min(doc_id) AS mn FROM (
        SELECT lang, doc_id,
               CASE WHEN pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6),
                                        16, 10) AS BIGINT), 100) < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM documents) x
      GROUP BY lang, split ORDER BY lang, split"""),

    // L2 norm (sequential fold, same order both engines) + int8
    // max-abs quantization of the first 4 dims; floor() keeps the
    // rounding rule identical cross-engine
    "ml_embed_quantize" -> sql("""
      WITH e AS (
        SELECT vec_id, embedding,
               array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings WHERE vec_id < 100)
      SELECT vec_id,
             round(sqrt(aggregate(embedding, CAST(0 AS DOUBLE),
                                  (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS l2,
             concat_ws(',', transform(slice(embedding, 1, 4),
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) / maxabs * 127) AS BIGINT) AS STRING))) AS q4
      FROM e ORDER BY vec_id"""),

    "fn_strdist" -> sql("""
      SELECT n_nationkey,
             hamming_distance(n_name, reverse(n_name)) AS hd_rev,
             hamming_distance(n_name, n_name) AS hd_self,
             hamming_distance(n_name, concat(n_name, 'X')) AS hd_null,
             concat_ws(',', transform(array('A', 'N', 'ZZZ', '_'),
               p -> CAST(locate(p, n_name) AS STRING))) AS multi_pos
      FROM nation ORDER BY n_nationkey"""),

    "fn_compress" -> sql("""
      SELECT doc_id,
             uncompress(compress(text)) = text AS rt_ok,
             length(compress(repeat(text, 8))) < length(repeat(text, 8)) AS shrinks,
             md5(uncompress(compress(text))) AS rt_md5
      FROM documents WHERE doc_id < 200 ORDER BY doc_id"""),

    // bit scalar family (plus MySQL field()): bit_count /
    // shiftleft/shiftright / and-or-xor-not over BIGINT keys
    "fn_bitops" -> sql("""
      SELECT n_nationkey,
             CAST(bit_count(n_nationkey) AS INT) AS bc,
             shiftleft(n_nationkey, 3) AS shl,
             shiftright(n_nationkey * 1000, 2) AS shr,
             CAST(n_nationkey & 12 AS BIGINT) AS band,
             CAST(n_nationkey | 5 AS BIGINT) AS bor,
             CAST(n_nationkey ^ 9 AS BIGINT) AS bxor,
             CAST(~n_nationkey AS BIGINT) AS bnot,
             CAST(coalesce(array_position(
               array('NATION_3', 'NATION_7', 'NATION_11'), n_name), 0) AS BIGINT) AS fld
      FROM nation ORDER BY n_nationkey"""),

    // engine-side hashes pinned to the reference's PUBLISHED output
    // vectors (regression-test/.../scalar_function/M.out fn_test rows)
    // — the oracle is the literal expected table, so the driver's
    // hash-compare checks our murmur32/murmur64/bitmap_hash bit-for-bit
    // against Doris
    "fn_hash_pinned" -> sql("""
      SELECT s, murmur_hash3_32(s) AS h32, murmur_hash3_64(s) AS h64,
             bitmap_to_string(bitmap_hash(s)) AS bh32,
             bitmap_to_string(bitmap_hash64(s)) AS bh64
      FROM VALUES ('varchar11'), ('varchar12'), ('varchar13'), ('string1') AS t(s)
      ORDER BY s"""),

    // variadic chaining + xxhash_32, pinned to the reference's
    // test_hash_function.out ("hello"/"world" vectors)
    "fn_hash_chained" -> sql("""
      SELECT murmur_hash3_32('hello') AS m32,
             murmur_hash3_32('hello', 'world') AS m32c,
             murmur_hash3_64('hello') AS m64,
             murmur_hash3_64('hello', 'world') AS m64c,
             xxhash_32('hello') AS x32,
             xxhash_32('hello', 'world') AS x32c"""),

    // remaining Doris array surface (function_array_enumerate[_uniq]
    // .cpp, array_insert/prepend/append/compact/repeat) — canonical
    // string outputs, DuckDB list emulations as the oracle
    "fn_array2" -> sql("""
      WITH d AS (SELECT n_nationkey,
                        array(CAST(n_nationkey % 3 AS BIGINT),
                              CAST(n_nationkey % 2 AS BIGINT),
                              CAST(n_nationkey % 3 AS BIGINT)) AS a
                 FROM nation)
      SELECT n_nationkey,
             concat_ws(',', transform(sequence(1, size(a)),
               i -> CAST(i AS STRING))) AS enum,
             concat_ws(',', transform(sequence(1, size(a)),
               i -> CAST(size(filter(slice(a, 1, i), y -> y = element_at(a, i)))
                         AS STRING))) AS enum_uniq,
             concat_ws(',', array_insert(a, 2, CAST(99 AS BIGINT))) AS ins,
             concat_ws(',', array_prepend(a, CAST(-1 AS BIGINT))) AS pre,
             concat_ws(',', array_append(a, CAST(7 AS BIGINT))) AS app,
             concat_ws(',', array_compact(array(element_at(a, 1), NULL,
                                                element_at(a, 2)))) AS cmpct,
             concat_ws(',', array_repeat(CAST(n_nationkey AS STRING), 3)) AS rep
      FROM d ORDER BY n_nationkey"""),

    // named quantile_state surface: per-shard to_quantile_state ->
    // quantile_union merge -> quantile_percent finalize, the reference's
    // QUANTILE_STATE column lifecycle (exact where Doris's TDigest is
    // approximate); oracle = DuckDB quantile_cont over the raw values
    "state_quantile2" -> sql("""
      WITH shard AS (
        SELECT l_returnflag, pmod(l_orderkey, 8) AS sh,
               to_quantile_state(CAST(l_quantity AS DOUBLE)) AS qs
        FROM lineitem GROUP BY l_returnflag, pmod(l_orderkey, 8))
      SELECT l_returnflag,
             round(quantile_percent(quantile_union(qs), CAST(0.5 AS DOUBLE)), 6) AS p50,
             round(quantile_percent(quantile_union(qs), CAST(0.9 AS DOUBLE)), 6) AS p90
      FROM shard GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // IPv6 family pinned to inet_pton-derived vectors (DuckDB's INET
    // extension is unavailable offline, so the oracle is literal)
    "misc_ipv6" -> sql("""
      SELECT s,
             upper(hex(ipv6_string_to_num(s))) AS num_hex,
             is_ipv6_string(s) AS ok6,
             ipv6_num_to_string(ipv6_string_to_num(s)) AS canon,
             upper(hex(cut_ipv6(ipv6_string_to_num(s), 8, 2))) AS cut_hex,
             upper(hex(ipv4_to_ipv6('192.168.1.1'))) AS v4map,
             is_ipv6_string('not an ip') AS bad
      FROM VALUES ('::1'), ('2001:db8::8a2e:370:7334'), ('fe80::1') AS t(s)
      ORDER BY s"""),

    // second alias pack: double math, period arithmetic, char-set
    // trims, regexp conveniences, masking, epoch/iso conversions
    "fn_alias_math" -> sql("""
      SELECT n_nationkey,
             round(dexp(CAST(n_nationkey % 5 AS DOUBLE) / 10), 6) AS de,
             round(dlog10(CAST(n_nationkey + 1 AS DOUBLE)), 6) AS dl,
             dsqrt(CAST(n_nationkey * n_nationkey AS DOUBLE)) AS dsq,
             dpow(2.0, CAST(n_nationkey % 10 AS DOUBLE)) AS dp,
             round(fmod(CAST(n_nationkey AS DOUBLE) + 0.75, 3.0), 6) AS fm,
             dceil(CAST(n_nationkey AS DOUBLE) / 4) AS dc,
             dfloor(CAST(n_nationkey AS DOUBLE) / 4) AS df,
             even(CAST(n_nationkey AS DOUBLE) / 2) AS ev,
             signbit(CAST(n_nationkey AS DOUBLE) - 12) AS sb,
             isinf(CAST(n_nationkey AS DOUBLE)) AS inf0,
             period_add(202401, CAST(n_nationkey AS INT) - 12) AS pa,
             period_diff(202403, 202300 + CAST(n_nationkey % 12 + 1 AS INT)) AS pd,
             gcd(n_nationkey + 4, 6) AS g, lcm(n_nationkey % 5 + 1, 4) AS l
      FROM nation ORDER BY n_nationkey"""),

    "fn_alias_str2" -> sql("""
      SELECT n_nationkey,
             ltrim_in(concat('xyx', n_name, 'yx'), 'xy') AS lt,
             rtrim_in(concat('xyx', n_name, 'yx'), 'xy') AS rt,
             trim_in(concat('xyx', n_name, 'yx'), 'xy') AS bt,
             concat_ws(',', regexp_extract_all_array(concat(n_name, '_', n_name), '[0-9]+')) AS rea,
             regexp_extract_or_null(n_name, 'NATION_([0-9]+)') AS reo,
             regexp_extract_or_null(n_name, 'ZZZ([0-9]+)') AS reo_null,
             regexp_replace_one(concat(n_name, '_', n_name), 'N', 'M') AS rro,
             mask_first_n(concat(n_name, 'a9'), 3) AS mf,
             mask_last_n(concat(n_name, 'a9'), 3) AS ml,
             digital_masking(1380013800 + n_nationkey) AS dm,
             CAST(from_second(1000000 + n_nationkey) AS STRING) AS fs,
             millisecond_timestamp(from_millisecond(123456789 + n_nationkey)) AS mst,
             to_iso8601(TIMESTAMP '2026-08-12 09:05:03.000001') AS iso,
             CAST(from_iso8601_date('2026-08-12') AS STRING) AS isod
      FROM nation ORDER BY n_nationkey"""),

    // json_quote/unquote roundtrip + MySQL containment + path existence
    // over the events props documents
    "fn_json2" -> sql("""
      SELECT event_id,
             json_unquote(json_quote(concat('a"b\\', CAST(event_id AS STRING)))) AS quote_rt,
             json_quote('x') AS q,
             json_contains(props, props) AS self_c,
             json_contains(props, concat('{"k":', get_json_object(props, '$.k'), '}')) AS kv_c,
             json_contains(props, '{"zzz":1}') AS miss_c,
             json_contains('[1,2,3]', '2') AS arr_c,
             json_contains('[1,2,3]', '[1,3]') AS arr2_c,
             json_contains('[1,2,3]', '9') AS arr_miss,
             json_exists_path(props, '$.k') AS has_k,
             json_exists_path(props, '$.zzz') AS has_z
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    // Doris-named alias layer (AliasFunctions) — date/time arithmetic,
    // remaining ceil/floor units, extracts, string/numeric conveniences
    "fn_alias_date" -> sql("""
      SELECT event_id,
             unix_micros(days_add(ts, 3)) AS da,
             unix_micros(hours_sub(ts, 5)) AS hs,
             minutes_diff(ts, timestamp_micros(0)) AS mdif,
             unix_micros(months_add(ts, 2)) AS ma,
             unix_micros(week_ceil(ts)) AS wc,
             unix_micros(month_ceil(ts)) AS mc2,
             unix_micros(year_floor(ts)) AS yf,
             unix_micros(second_ceil(ts)) AS sc,
             microsecond(ts) AS us,
             CAST(week(CAST(ts AS DATE)) AS BIGINT) AS wk,
             CAST(week(date_sub(CAST(ts AS DATE), 366)) AS BIGINT) AS wk23,
             CAST(to_monday(CAST(ts AS DATE)) AS STRING) AS mon,
             to_seconds(CAST(ts AS DATE)) AS tsec,
             unix_micros(str_to_date('2026-08-12 09:05:03', '%Y-%m-%d %H:%i:%s')) AS std,
             timediff(ts, days_sub(ts, 1)) AS td
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    "fn_alias_misc" -> sql("""
      SELECT n_nationkey,
             starts_with(n_name, 'NATION') AS sw, ends_with(n_name, '1') AS ew,
             from_base64(to_base64(n_name)) AS b64rt,
             md5sum(n_name) AS m5,
             round_bankers(CAST(n_nationkey AS DOUBLE) + 0.5, 0) AS rb,
             truncate(CAST(n_nationkey AS DOUBLE) * 1.117, 1) AS tr,
             xor(n_nationkey, 5) AS xr,
             sub_replace(n_name, 'ZZ', 2, 3) AS srep,
             count_substrings(concat(n_name, '_', n_name), 'N') AS cs,
             concat_ws(',', split_by_string(concat('a.b.', CAST(n_nationkey AS STRING)), '.')) AS sbs,
             map_size(map('a', CAST(1 AS BIGINT))) AS ms,
             map_contains_value(map('a', CAST(n_nationkey AS BIGINT)),
                                CAST(n_nationkey AS BIGINT)) AS mcv,
             concat_ws(',', array_concat(array(CAST(1 AS BIGINT)),
                                         array(CAST(n_nationkey AS BIGINT)))) AS ac,
             concat_ws(',', array_range(0, CAST(n_nationkey % 4 AS INT))) AS ar,
             concat_ws(',', array_popback(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                                                CAST(n_nationkey AS BIGINT)))) AS pb,
             concat_ws(',', array_popfront(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                                                 CAST(n_nationkey AS BIGINT)))) AS pf,
             concat_ws(',', array_with_constant(3, CAST(n_nationkey % 2 AS BIGINT))) AS awc,
             countequal(array(CAST(1 AS BIGINT), CAST(1 AS BIGINT),
                              CAST(n_nationkey % 2 AS BIGINT)), CAST(1 AS BIGINT)) AS ce,
             array_sum(array(CAST(n_nationkey AS BIGINT), CAST(2 AS BIGINT))) AS asum,
             round(array_avg(array(CAST(n_nationkey AS BIGINT), CAST(3 AS BIGINT))), 6) AS aavg,
             array_product(array(CAST(n_nationkey % 5 + 1 AS BIGINT), CAST(2 AS BIGINT))) AS aprod,
             concat_ws(',', array_cum_sum(array(CAST(1 AS BIGINT), CAST(n_nationkey AS BIGINT),
                                                CAST(2 AS BIGINT)))) AS acs,
             concat_ws(',', array_difference(array(CAST(5 AS BIGINT), CAST(n_nationkey AS BIGINT),
                                                   CAST(2 AS BIGINT)))) AS adiff,
             concat_ws(',', array_enumerate(array(CAST(7 AS BIGINT), CAST(8 AS BIGINT)))) AS aen,
             bitmap_count(bitmap_from_base64(bitmap_to_base64(bitmap_from_string('1,2,3')))) AS bmrt,
             bitmap_and_not_count(bitmap_from_string('1,2,3'), bitmap_from_string('2')) AS banc
      FROM nation ORDER BY n_nationkey"""),

    // SQL dialect conveniences the reference's analyzer also offers:
    // star-except projection and GROUP BY ALL inference
    "ds_dialect_sugar" -> sql("""
      SELECT * EXCEPT (mn) FROM (
        SELECT n_regionkey, count(*) AS n, min(n_name) AS mn
        FROM nation GROUP BY ALL) x
      ORDER BY n_regionkey"""),

    // map HOF family (function_map.cpp + Doris map lambda surface):
    // map_contains_key, entries, map_filter, transform_keys/values —
    // canonicalized to sorted entry strings; the oracle recomputes the
    // expected entries from the source columns directly
    "fn_map2" -> sql("""
      WITH d AS (SELECT n_nationkey,
                        map('a', CAST(n_nationkey AS BIGINT),
                            'b', CAST(n_regionkey AS BIGINT)) AS m
                 FROM nation)
      SELECT n_nationkey,
             map_contains_key(m, 'a') AS has_a,
             map_contains_key(m, 'z') AS has_z,
             concat_ws('|', transform(array_sort(map_keys(m)),
               k -> concat(k, '=', CAST(element_at(m, k) AS STRING)))) AS entries,
             concat_ws('|', array_sort(map_keys(
               map_filter(m, (k, v) -> v % 2 = 0)))) AS even_keys,
             concat_ws('|', transform(array_sort(map_keys(m)),
               k -> concat(upper(k), '=',
                           CAST(element_at(m, k) * 10 AS STRING)))) AS upper_x10,
             size(map_concat(m, map('c', CAST(1 AS BIGINT)))) AS n_concat
      FROM d ORDER BY n_nationkey"""),

    // crc32 (function_string_misc.cpp) — standard CRC-32; pinned
    // literals because DuckDB has no crc32
    "fn_crc32" -> sql("""
      SELECT s, crc32(CAST(s AS BINARY)) AS c
      FROM VALUES ('hello'), ('world'), ('apache doris'), ('') AS t(s)
      ORDER BY s"""),

    // soundex (function_soundex.cpp) — classic published vectors as the
    // literal oracle (DuckDB has no soundex)
    "fn_soundex" -> sql("""
      SELECT s, soundex(s) AS sx
      FROM VALUES ('SMITH'), ('SMYTH'), ('ROBERT'), ('RUPERT'),
                  ('GAUSS'), ('HILBERT'), ('LLOYD'), ('PFISTER') AS t(s)
      ORDER BY s"""),

    // equi-height histogram (aggregate_function_histogram.*): ntile
    // splits each group into equal-count buckets; emit per-bucket
    // [lo, hi, n] — ntile's floor-based sizing is identical cross-engine
    "state_histogram_eqh" -> sql("""
      WITH b AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS bk
        FROM customer)
      SELECT c_mktsegment, bk,
             CAST(min(c_acctbal) AS DOUBLE) AS lo,
             CAST(max(c_acctbal) AS DOUBLE) AS hi,
             count(*) AS n
      FROM b GROUP BY c_mktsegment, bk
      ORDER BY c_mktsegment, bk"""),

    // percentile over an array of fractions (Doris percentile_array) —
    // canonicalized to a string (array outputs crash the driver's sort)
    "agg_percentile_array" -> sql("""
      SELECT l_returnflag,
             concat_ws('|', transform(
               percentile(CAST(l_quantity AS INT), array(0.1, 0.5, 0.9)),
               x -> CAST(round(x, 6) AS STRING))) AS ps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  def oracle: Map[String, String] = Map(
    "ml_dedup_components" -> """
      WITH RECURSIVE k AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      f AS (SELECT doc_id,
                   md5(array_to_string(ws[1:3], ' ')) AS k1,
                   md5(array_to_string(ws[3:5], ' ')) AS k2
            FROM k WHERE len(ws) >= 5),
      e AS (SELECT a.doc_id AS s, b.doc_id AS t
            FROM f a JOIN f b ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id
            FROM f a JOIN f b ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      reach(src, dst) AS (
        SELECT id, id FROM (SELECT DISTINCT s AS id FROM e) n
        UNION
        SELECT r.src, e.t FROM reach r JOIN e ON r.dst = e.s),
      lab AS (SELECT src AS id, min(dst) AS lab FROM reach GROUP BY src)
      SELECT lab, count(*) AS sz, max(id) AS mx
      FROM lab GROUP BY lab ORDER BY lab""",

    "ml_pipeline_e2e" -> """
      WITH RECURSIVE c AS (
        SELECT doc_id, lang, text FROM documents
        WHERE len(string_split(text, ' ')) >= 5),
      keep AS (SELECT min(doc_id) AS doc_id FROM c GROUP BY md5(text)),
      surv AS (SELECT c.doc_id, c.lang, c.text
               FROM c JOIN keep ON c.doc_id = keep.doc_id),
      f AS (SELECT doc_id,
                   md5(array_to_string(string_split(text, ' ')[1:3], ' ')) AS k1,
                   md5(array_to_string(string_split(text, ' ')[3:5], ' ')) AS k2
            FROM surv),
      e AS (SELECT a.doc_id AS s, b.doc_id AS t
            FROM f a JOIN f b ON a.k1 = b.k1 AND a.doc_id <> b.doc_id
            UNION
            SELECT a.doc_id, b.doc_id
            FROM f a JOIN f b ON a.k2 = b.k2 AND a.doc_id <> b.doc_id),
      reach(src, dst) AS (
        SELECT id, id FROM (SELECT DISTINCT s AS id FROM e) n
        UNION
        SELECT r.src, e.t FROM reach r JOIN e ON r.dst = e.s),
      lab AS (SELECT src AS id, min(dst) AS lab FROM reach GROUP BY src),
      reps AS (
        SELECT s.doc_id, s.lang, s.text FROM surv s
        LEFT JOIN lab c ON s.doc_id = c.id
        WHERE c.id IS NULL OR c.lab = s.doc_id),
      sp AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS toks,
                    CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                              AS BIGINT) % 100 < 80
                         THEN 'train' ELSE 'test' END AS split
             FROM reps)
      SELECT lang, split, count(*) AS n, CAST(sum(toks) AS BIGINT) AS total_toks,
             min(doc_id) AS mn, max(doc_id) AS mx
      FROM sp GROUP BY lang, split ORDER BY lang, split""",

    "ml_train_test_split" -> """
      SELECT lang, split, count(*) AS n, min(doc_id) AS mn FROM (
        SELECT lang, doc_id,
               CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                         AS BIGINT) % 100 < 80
                    THEN 'train' ELSE 'test' END AS split
        FROM documents) x
      GROUP BY lang, split ORDER BY lang, split""",

    "ml_embed_quantize" -> """
      WITH e AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings WHERE vec_id < 100)
      SELECT vec_id,
             round(sqrt(list_sum(list_transform(embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2,
             array_to_string(list_transform(embedding[1:4],
               x -> CAST(CAST(floor(CAST(x AS DOUBLE) / maxabs * 127) AS BIGINT) AS VARCHAR)), ',') AS q4
      FROM e ORDER BY vec_id""",

    "fn_strdist" -> """
      SELECT n_nationkey,
             CAST(hamming(n_name, reverse(n_name)) AS INT) AS hd_rev,
             CAST(0 AS INT) AS hd_self,
             CAST(NULL AS INT) AS hd_null,
             array_to_string(list_transform(['A', 'N', 'ZZZ', '_'],
               p -> CAST(strpos(n_name, p) AS VARCHAR)), ',') AS multi_pos
      FROM nation ORDER BY n_nationkey""",

    "fn_compress" -> """
      SELECT doc_id, true AS rt_ok, true AS shrinks, md5(text) AS rt_md5
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""",

    "fn_bitops" -> """
      SELECT n_nationkey,
             CAST(bit_count(n_nationkey) AS INT) AS bc,
             n_nationkey << 3 AS shl,
             (n_nationkey * 1000) >> 2 AS shr,
             CAST(n_nationkey & 12 AS BIGINT) AS band,
             CAST(n_nationkey | 5 AS BIGINT) AS bor,
             CAST(xor(n_nationkey, 9) AS BIGINT) AS bxor,
             CAST(~n_nationkey AS BIGINT) AS bnot,
             CAST(coalesce(list_position(
               ['NATION_3', 'NATION_7', 'NATION_11'], n_name), 0) AS BIGINT) AS fld
      FROM nation ORDER BY n_nationkey""",

    "fn_hash_pinned" -> """
      SELECT * FROM (VALUES
        ('string1',   1105201137,  CAST(-7629742527255288609 AS BIGINT),
         '1105201137', '10817001546454263007'),
        ('varchar11', 1382328699,  CAST(8683832286507167489 AS BIGINT),
         '1382328699', '8683832286507167489'),
        ('varchar12', -216074155,  CAST(8582507899476528269 AS BIGINT),
         '4078893141', '8582507899476528269'),
        ('varchar13', -1704245912, CAST(3951582574031518507 AS BIGINT),
         '2590721384', '3951582574031518507'))
        t(s, h32, h64, bh32, bh64)
      ORDER BY s""",

    "fn_hash_chained" -> """
      SELECT CAST(1321743225 AS INT) AS m32, CAST(984713481 AS INT) AS m32c,
             CAST(-3215607508166160593 AS BIGINT) AS m64,
             CAST(3583109472027628045 AS BIGINT) AS m64c,
             CAST(-83855367 AS INT) AS x32, CAST(-920844969 AS INT) AS x32c""",

    "fn_array2" -> """
      WITH d AS (SELECT n_nationkey,
                        [CAST(n_nationkey % 3 AS BIGINT),
                         CAST(n_nationkey % 2 AS BIGINT),
                         CAST(n_nationkey % 3 AS BIGINT)] AS a
                 FROM nation)
      SELECT n_nationkey,
             array_to_string(list_transform(generate_series(1, len(a)),
               i -> CAST(i AS VARCHAR)), ',') AS enum,
             array_to_string(list_transform(generate_series(1, len(a)),
               i -> CAST(len(list_filter(a[1:i], y -> y = a[i])) AS VARCHAR)), ',') AS enum_uniq,
             array_to_string(list_concat(a[1:1],
               list_prepend(CAST(99 AS BIGINT), a[2:])), ',') AS ins,
             array_to_string(list_prepend(CAST(-1 AS BIGINT), a), ',') AS pre,
             array_to_string(list_append(a, CAST(7 AS BIGINT)), ',') AS app,
             array_to_string(list_filter([a[1], NULL, a[2]],
               x -> x IS NOT NULL), ',') AS cmpct,
             array_to_string([CAST(n_nationkey AS VARCHAR),
                              CAST(n_nationkey AS VARCHAR),
                              CAST(n_nationkey AS VARCHAR)], ',') AS rep
      FROM d ORDER BY n_nationkey""",

    "ds_dialect_sugar" -> """
      SELECT n_regionkey, count(*) AS n
      FROM nation GROUP BY ALL ORDER BY n_regionkey""",

    "state_quantile2" -> """
      SELECT l_returnflag,
             round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS p50,
             round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.9), 6) AS p90
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "misc_ipv6" -> """
      SELECT * FROM (VALUES
        ('2001:db8::8a2e:370:7334', '20010DB80000000000008A2E03707334', true,
         '2001:db8::8a2e:370:7334', '20010DB8000000000000000000000000',
         '00000000000000000000FFFFC0A80101', false),
        ('::1', '00000000000000000000000000000001', true,
         '::1', '00000000000000000000000000000000',
         '00000000000000000000FFFFC0A80101', false),
        ('fe80::1', 'FE800000000000000000000000000001', true,
         'fe80::1', 'FE800000000000000000000000000000',
         '00000000000000000000FFFFC0A80101', false))
        t(s, num_hex, ok6, canon, cut_hex, v4map, bad)
      ORDER BY s""",

    "fn_alias_math" -> """
      SELECT n_nationkey,
             round(exp(CAST(n_nationkey % 5 AS DOUBLE) / 10), 6) AS de,
             round(log10(CAST(n_nationkey + 1 AS DOUBLE)), 6) AS dl,
             sqrt(CAST(n_nationkey * n_nationkey AS DOUBLE)) AS dsq,
             power(2.0, CAST(n_nationkey % 10 AS DOUBLE)) AS dp,
             round((CAST(n_nationkey AS DOUBLE) + 0.75) % 3.0, 6) AS fm,
             CAST(ceil(CAST(n_nationkey AS DOUBLE) / 4) AS DOUBLE) AS dc,
             CAST(floor(CAST(n_nationkey AS DOUBLE) / 4) AS DOUBLE) AS df,
             CAST(CASE WHEN n_nationkey = 0 THEN 0
                       ELSE 2 * ceil(CAST(n_nationkey AS DOUBLE) / 4) END AS BIGINT) AS ev,
             n_nationkey - 12 < 0 AS sb,
             false AS inf0,
             CAST((24276 + n_nationkey) // 12 * 100 + (24276 + n_nationkey) % 12 + 1 AS INT) AS pa,
             CAST(14 - n_nationkey % 12 AS INT) AS pd,
             CAST(gcd(n_nationkey + 4, 6) AS BIGINT) AS g,
             CAST(lcm(n_nationkey % 5 + 1, 4) AS BIGINT) AS l
      FROM nation ORDER BY n_nationkey""",

    "fn_alias_str2" -> """
      WITH d AS (SELECT n_nationkey, n_name,
                        concat('xyx', n_name, 'yx') AS wrapped,
                        concat(n_name, 'a9') AS suffixed,
                        concat(n_name, '_', n_name) AS doubled
                 FROM nation)
      SELECT n_nationkey,
             ltrim(wrapped, 'xy') AS lt,
             rtrim(wrapped, 'xy') AS rt,
             trim(wrapped, 'xy') AS bt,
             array_to_string(regexp_extract_all(doubled, '[0-9]+'), ',') AS rea,
             CAST(n_nationkey AS VARCHAR) AS reo,
             CAST(NULL AS VARCHAR) AS reo_null,
             regexp_replace(doubled, 'N', 'M') AS rro,
             concat('XXX', substr(suffixed, 4)) AS mf,
             concat(substr(suffixed, 1, length(suffixed) - 3),
                    regexp_replace(regexp_replace(regexp_replace(
                      right(suffixed, 3), '[a-z]', 'x', 'g'), '[A-Z]', 'X', 'g'),
                      '[0-9]', 'n', 'g')) AS ml,
             concat('138', '****',
                    right(CAST(1380013800 + n_nationkey AS VARCHAR), 4)) AS dm,
             CAST(CAST(to_timestamp(1000000 + n_nationkey) AS TIMESTAMP) AS VARCHAR) AS fs,
             123456789 + n_nationkey AS mst,
             '2026-08-12T09:05:03.000001' AS iso,
             '2026-08-12' AS isod
      FROM d ORDER BY n_nationkey""",

    "fn_json2" -> """
      SELECT event_id,
             concat('a"b\', CAST(event_id AS VARCHAR)) AS quote_rt,
             '"x"' AS q,
             true AS self_c, true AS kv_c, false AS miss_c,
             true AS arr_c, true AS arr2_c, false AS arr_miss,
             true AS has_k, false AS has_z
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "fn_alias_date" -> """
      SELECT event_id,
             epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 3 DAY) AS da,
             epoch_us(CAST(ts AS TIMESTAMP) - INTERVAL 5 HOUR) AS hs,
             epoch_us(ts) // 60000000 AS mdif,
             epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 2 MONTH) AS ma,
             epoch_us(CASE WHEN date_trunc('week', CAST(ts AS TIMESTAMP)) = CAST(ts AS TIMESTAMP)
                           THEN CAST(ts AS TIMESTAMP)
                           ELSE date_trunc('week', CAST(ts AS TIMESTAMP)) + INTERVAL 7 DAY END) AS wc,
             epoch_us(CASE WHEN date_trunc('month', CAST(ts AS TIMESTAMP)) = CAST(ts AS TIMESTAMP)
                           THEN CAST(ts AS TIMESTAMP)
                           ELSE date_trunc('month', CAST(ts AS TIMESTAMP)) + INTERVAL 1 MONTH END) AS mc2,
             epoch_us(date_trunc('year', CAST(ts AS TIMESTAMP))) AS yf,
             ((epoch_us(ts) + 999999) // 1000000) * 1000000 AS sc,
             epoch_us(ts) % 1000000 AS us,
             CAST(strftime(CAST(ts AS DATE), '%U') AS BIGINT) AS wk,
             CAST(strftime(CAST(ts AS DATE) - 366, '%U') AS BIGINT) AS wk23,
             CAST(CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS VARCHAR) AS mon,
             (date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 719528) * 86400 AS tsec,
             epoch_us(TIMESTAMP '2026-08-12 09:05:03') AS std,
             '24:00:00' AS td
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "fn_alias_misc" -> """
      SELECT n_nationkey,
             starts_with(n_name, 'NATION') AS sw, ends_with(n_name, '1') AS ew,
             n_name AS b64rt,
             md5(n_name) AS m5,
             CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_nationkey AS DOUBLE)
                  ELSE CAST(n_nationkey + 1 AS DOUBLE) END AS rb,
             trunc(CAST(n_nationkey AS DOUBLE) * 1.117 * 10) / 10 AS tr,
             CAST(xor(n_nationkey, 5) AS BIGINT) AS xr,
             concat(n_name[1:2], 'ZZ', n_name[6:]) AS srep,
             CAST((length(concat(n_name, '_', n_name))
                   - length(replace(concat(n_name, '_', n_name), 'N', ''))) AS INT) AS cs,
             concat('a,b,', CAST(n_nationkey AS VARCHAR)) AS sbs,
             1 AS ms, true AS mcv,
             concat('1,', CAST(n_nationkey AS VARCHAR)) AS ac,
             coalesce(array_to_string(list_transform(range(0, CAST(n_nationkey % 4 AS INT)),
                                            x -> CAST(x AS VARCHAR)), ','), '') AS ar,
             '1,2' AS pb,
             concat('2,', CAST(n_nationkey AS VARCHAR)) AS pf,
             concat_ws(',', CAST(n_nationkey % 2 AS VARCHAR), CAST(n_nationkey % 2 AS VARCHAR),
                       CAST(n_nationkey % 2 AS VARCHAR)) AS awc,
             CAST(2 + CASE WHEN n_nationkey % 2 = 1 THEN 1 ELSE 0 END AS BIGINT) AS ce,
             n_nationkey + 2 AS asum,
             round((n_nationkey + 3) / 2.0, 6) AS aavg,
             (n_nationkey % 5 + 1) * 2 AS aprod,
             concat('1,', CAST(1 + n_nationkey AS VARCHAR), ',',
                    CAST(3 + n_nationkey AS VARCHAR)) AS acs,
             concat('0,', CAST(n_nationkey - 5 AS VARCHAR), ',',
                    CAST(2 - n_nationkey AS VARCHAR)) AS adiff,
             '1,2' AS aen,
             CAST(3 AS BIGINT) AS bmrt, CAST(2 AS BIGINT) AS banc
      FROM nation ORDER BY n_nationkey""",

    "fn_map2" -> """
      SELECT n_nationkey,
             true AS has_a, false AS has_z,
             concat('a=', CAST(n_nationkey AS VARCHAR), '|b=',
                    CAST(n_regionkey AS VARCHAR)) AS entries,
             concat_ws('|',
               CASE WHEN n_nationkey % 2 = 0 THEN 'a' END,
               CASE WHEN n_regionkey % 2 = 0 THEN 'b' END) AS even_keys,
             concat('A=', CAST(n_nationkey * 10 AS VARCHAR), '|B=',
                    CAST(n_regionkey * 10 AS VARCHAR)) AS upper_x10,
             3 AS n_concat
      FROM nation ORDER BY n_nationkey""",

    "fn_crc32" -> """
      SELECT * FROM (VALUES
        ('', CAST(0 AS BIGINT)),
        ('apache doris', CAST(2505490720 AS BIGINT)),
        ('hello', CAST(907060870 AS BIGINT)),
        ('world', CAST(980881731 AS BIGINT))) t(s, c)
      ORDER BY s""",

    "fn_soundex" -> """
      SELECT * FROM (VALUES
        ('GAUSS', 'G200'), ('HILBERT', 'H416'), ('LLOYD', 'L300'),
        ('PFISTER', 'P236'), ('ROBERT', 'R163'), ('RUPERT', 'R163'),
        ('SMITH', 'S530'), ('SMYTH', 'S530')) t(s, sx)
      ORDER BY s""",

    "state_histogram_eqh" -> """
      WITH b AS (
        SELECT c_mktsegment, c_acctbal,
               ntile(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS bk
        FROM customer)
      SELECT c_mktsegment, CAST(bk AS INT) AS bk,
             CAST(min(c_acctbal) AS DOUBLE) AS lo,
             CAST(max(c_acctbal) AS DOUBLE) AS hi,
             count(*) AS n
      FROM b GROUP BY c_mktsegment, bk
      ORDER BY c_mktsegment, bk""",

    "agg_percentile_array" -> """
      SELECT l_returnflag,
             array_to_string(list_transform(
               quantile_cont(CAST(l_quantity AS INT), [0.1, 0.5, 0.9]),
               x -> CAST(round(x, 6) AS VARCHAR)), '|') AS ps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
