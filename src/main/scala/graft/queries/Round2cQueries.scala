package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Round-2 third sweep:
  *  - gaps-and-islands (consecutive-day activity streaks) — the window
  *    idiom behind Doris's retention/continuous-activity analyses.
  *  - inverted-index posting lists materialized as bitmaps: word ->
  *    bitmap(doc_id), boolean search = bitmap algebra (reference:
  *    inverted index + bitmap intersection in segment_iterator; here
  *    the posting table IS the index, queries are bitmap_and/or).
  *  - parquet schema evolution via mergeSchema (reference: schema
  *    change / light schema change — ALTER TABLE ADD COLUMN reads old
  *    tablets with NULL-filled new columns).
  */
object Round2cQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_gaps_islands" -> sql("""
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      isl AS (
        SELECT user_id, d,
               date_sub(d, CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)) AS anchor
        FROM days),
      streaks AS (
        SELECT user_id, anchor, count(*) AS len FROM isl
        GROUP BY user_id, anchor)
      SELECT user_id, count(*) AS n_streaks, max(len) AS longest,
             CAST(sum(len) AS BIGINT) AS n_days
      FROM streaks GROUP BY user_id ORDER BY user_id"""),

    "search_inverted_postings" -> sql("""
      WITH post AS (
        SELECT word, bitmap_agg(doc_id) AS bm FROM (
          -- tokenize() inlined: SQL UDFs cannot sit under Generate
          SELECT doc_id, explode(filter(split(lower(text), '[^a-z0-9]+'),
                                        t -> length(t) > 0)) AS word
          FROM documents) x
        GROUP BY word)
      SELECT bitmap_count(bitmap_and(a.bm, b.bm)) AS n_and,
             bitmap_count(bitmap_or(a.bm, b.bm)) AS n_or,
             bitmap_count(bitmap_andnot(a.bm, b.bm)) AS n_slow_only,
             bitmap_to_string(sub_bitmap(bitmap_and(a.bm, b.bm), 0, 10)) AS first10
      FROM post a CROSS JOIN post b
      WHERE a.word = 'slow' AND b.word = 'fast'"""),

    // any_value over constant-per-group input (deterministic) + mode
    // over a distribution with a unique maximum (TPC-H linenumber 1 is
    // strictly most frequent) — both verified exact.
    "agg_any_mode" -> sql("""
      SELECT l_returnflag,
             any_value(upper(l_returnflag)) AS av,
             mode(l_linenumber) AS md,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Doris array-aggregate scalar family (function_array_aggregation
    // .cpp): array_sum/avg/min/max/product/cum_sum over an array column.
    "fn_array_aggs" -> sql("""
      WITH d AS (
        SELECT n_nationkey,
               transform(sequence(1, CAST(n_nationkey % 5 + 2 AS INT)),
                         i -> CAST(i * (n_nationkey + 1) AS BIGINT)) AS a
        FROM nation)
      SELECT n_nationkey,
             aggregate(a, CAST(0 AS BIGINT), (s, x) -> s + x) AS arr_sum,
             round(CAST(aggregate(a, CAST(0 AS BIGINT), (s, x) -> s + x) AS DOUBLE)
                   / size(a), 6) AS arr_avg,
             array_min(a) AS arr_min,
             array_max(a) AS arr_max,
             aggregate(a, CAST(1 AS BIGINT), (s, x) -> s * x) AS arr_product,
             concat_ws('|', transform(sequence(1, size(a)),
               i -> CAST(aggregate(slice(a, 1, i), CAST(0 AS BIGINT), (s, x) -> s + x) AS STRING)))
               AS arr_cum_sum
      FROM d ORDER BY n_nationkey"""),

    "fn_string4" -> sql("""
      SELECT n_nationkey,
             locate('A', n_name) AS loc,
             instr(n_name, 'N') AS ins,
             startswith(n_name, 'NATION') AS sw,
             endswith(n_name, '1') AS ew,
             split_part(n_name, '_', 1) AS sp1,
             split_part(concat(n_name, '_', CAST(n_nationkey AS STRING)), '_', -1) AS spneg,
             btrim(n_name, 'AN') AS bt,
             url_decode(url_encode(concat(n_name, ' &', CAST(n_nationkey AS STRING)))) AS url_rt,
             left(n_name, 4) AS l4, right(n_name, 4) AS r4
      FROM nation ORDER BY n_nationkey"""),

    // Doris-named HOFs via native Catalyst builders (lambdas can't ride
    // SQL UDFs): array_map / array_filter / array_exists /
    // array_first_index.
    "fn_array_doris" -> sql("""
      WITH d AS (SELECT doc_id, split(text, ' ') AS ws
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id,
             concat_ws('|', array_map(slice(ws, 1, 5), w -> CAST(length(w) AS STRING))) AS lens5,
             array_join(array_filter(slice(ws, 1, 8), w -> length(w) > 3), '|') AS long8,
             array_exists(ws, w -> w = 'data') AS has_data,
             coalesce(array_position(ws,
               try_element_at(array_filter(ws, w -> length(w) > 4), 1)), 0) AS fidx
      FROM d ORDER BY doc_id"""),

    // running COUNT(DISTINCT) over an ordered window — unsupported
    // directly in Spark (and Doris plans it via a special rewrite);
    // expressed exactly via first-seen-month + cumulative sum.
    "ds_distinct_window" -> sql("""
      WITH first_seen AS (
        SELECT o_orderpriority, o_custkey,
               min(month(o_orderdate)) AS first_m
        FROM orders WHERE year(o_orderdate) = 1996
        GROUP BY o_orderpriority, o_custkey),
      per_month AS (
        SELECT o_orderpriority, first_m AS m, count(*) AS n_new
        FROM first_seen GROUP BY o_orderpriority, first_m)
      SELECT o_orderpriority, m,
             sum(n_new) OVER (PARTITION BY o_orderpriority ORDER BY m
                              ROWS UNBOUNDED PRECEDING) AS cum_distinct_cust
      FROM per_month ORDER BY o_orderpriority, m"""),

    // PERMISSIVE csv load with corrupt-record accounting (reference:
    // strict_mode / max_filter_ratio on stream load — bad rows are
    // counted, good rows land).
    "src_csv_malformed" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val out = "target/sources/malformed.csv"
      // two unambiguously-bad rows: a malformed numeric field and a row
      // with a missing column
      val rows = Seq("1,alpha,10.5", "2,beta,xx", "3,gamma,7.25",
        "4,delta", "5,epsilon,2.5")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target/sources"))
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        rows.mkString("\n").getBytes("UTF-8"))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("v", DoubleType), StructField("_corrupt_record", StringType)))
      val df = s.read.schema(schema).option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record").csv(out)
      df.agg(
          count(when(col("_corrupt_record").isNotNull, 1)).as("n_bad"),
          count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
          dbl(sum(when(col("_corrupt_record").isNull, col("v")))).as("sum_ok"))
    }),

    // wide-decimal exactness at the 38-digit boundary (reference:
    // DECIMAL256 — we cap at Spark's DECIMAL(38), documented divergence;
    // rendering via decimal-to-string keeps both engines full-scale)
    "fn_decimal38" -> sql("""
      SELECT l_linestatus,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))
                           * CAST(l_quantity AS DECIMAL(10,2))) AS DECIMAL(38,4)) AS STRING) AS big_sum,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DECIMAL(38,10)) AS STRING) AS wide_sum,
             CAST(max(CAST(l_extendedprice AS DECIMAL(20,10)) * CAST(100000000 AS DECIMAL(9,0)))
                  AS STRING) AS scaled_max
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),

    "fn_string3" -> sql("""
      SELECT n_nationkey,
             find_in_set(n_name, concat('X,', n_name, ',Y')) AS fis,
             concat('[', space(CAST(n_nationkey % 3 AS INT)), ']') AS sp,
             char_length(n_name) AS cl,
             CAST(aes_decrypt(aes_encrypt(n_name, '0123456789abcdef'),
                              '0123456789abcdef') AS STRING) AS aes_rt,
             date_format_mysql(TIMESTAMP '2026-08-12 09:05:03', '%Y-%m-%d %H:%i:%s') AS dfm,
             date_format_mysql(DATE '2026-02-01', '%d/%m/%y') AS dfm2
      FROM nation ORDER BY n_nationkey"""),

    // dynamic partition overwrite: second load replaces ONLY the
    // partitions it contains (reference: INSERT OVERWRITE partition /
    // auto-partition overwrite semantics).
    "src_partition_overwrite" -> ((s, dir) => {
      val out = "target/sources/part_overwrite"
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      o.write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
      o.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.partitionBy("o_orderpriority").mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), moneySumDbl(col("o_totalprice")).as("tot"))
        .orderBy(col("o_orderpriority"))
    }),

    "src_schema_evolution" -> ((s, dir) => {
      val n = t(s, dir, "nation")
      val v1 = "target/sources/evo_v1"
      val v2 = "target/sources/evo_v2"
      // v1: original narrow schema; v2: adds a derived column (the
      // light-schema-change ADD COLUMN analog)
      n.filter(col("n_nationkey") < 10)
        .select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(v1)
      n.filter(col("n_nationkey") >= 10)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").parquet(v2)
      s.read.option("mergeSchema", "true").parquet(v1, v2)
        .groupBy(coalesce(col("n_regionkey"), lit(-1)).as("rk"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("mn"))
        .orderBy(col("rk"))
    })
  )

  def oracle: Map[String, String] = Map(
    "ds_gaps_islands" -> """
      WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      isl AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT) AS anchor
        FROM days),
      streaks AS (
        SELECT user_id, anchor, count(*) AS len FROM isl
        GROUP BY user_id, anchor)
      SELECT user_id, count(*) AS n_streaks, max(len) AS longest,
             CAST(sum(len) AS BIGINT) AS n_days
      FROM streaks GROUP BY user_id ORDER BY user_id""",

    "search_inverted_postings" -> """
      WITH tok AS (
        SELECT doc_id,
               list_distinct(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> length(t) > 0)) AS ts
        FROM documents),
      s AS (SELECT doc_id FROM tok WHERE list_contains(ts, 'slow')),
      f AS (SELECT doc_id FROM tok WHERE list_contains(ts, 'fast'))
      SELECT (SELECT count(*) FROM s WHERE doc_id IN (SELECT doc_id FROM f)) AS n_and,
             (SELECT count(DISTINCT doc_id) FROM (SELECT doc_id FROM s UNION SELECT doc_id FROM f) u) AS n_or,
             (SELECT count(*) FROM s WHERE doc_id NOT IN (SELECT doc_id FROM f)) AS n_slow_only,
             (SELECT array_to_string(list_sort(list(doc_id))[1:10], ',') FROM s
              WHERE doc_id IN (SELECT doc_id FROM f)) AS first10""",

    "agg_any_mode" -> """
      SELECT l_returnflag, upper(l_returnflag) AS av,
             CAST(mode(l_linenumber) AS BIGINT) AS md, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "fn_array_aggs" -> """
      WITH d AS (
        SELECT n_nationkey,
               list_transform(generate_series(1, CAST(n_nationkey % 5 + 2 AS INT)),
                              i -> CAST(i * (n_nationkey + 1) AS BIGINT)) AS a
        FROM nation)
      SELECT n_nationkey,
             CAST(list_sum(a) AS BIGINT) AS arr_sum,
             round(CAST(list_sum(a) AS DOUBLE) / len(a), 6) AS arr_avg,
             list_min(a) AS arr_min,
             list_max(a) AS arr_max,
             CAST(list_reduce(list_prepend(CAST(1 AS BIGINT), a), (s, x) -> s * x) AS BIGINT) AS arr_product,
             array_to_string(list_transform(generate_series(1, len(a)),
               i -> CAST(list_sum(a[1:i]) AS BIGINT)), '|') AS arr_cum_sum
      FROM d ORDER BY n_nationkey""",

    "fn_string4" -> """
      SELECT n_nationkey,
             CAST(strpos(n_name, 'A') AS INT) AS loc,
             CAST(strpos(n_name, 'N') AS INT) AS ins,
             starts_with(n_name, 'NATION') AS sw,
             ends_with(n_name, '1') AS ew,
             split_part(n_name, '_', 1) AS sp1,
             list_extract(string_split(concat(n_name, '_', CAST(n_nationkey AS VARCHAR)), '_'), -1) AS spneg,
             trim(n_name, 'AN') AS bt,
             concat(n_name, ' &', CAST(n_nationkey AS VARCHAR)) AS url_rt,
             n_name[1:4] AS l4, n_name[-4:] AS r4
      FROM nation ORDER BY n_nationkey""",

    "fn_array_doris" -> """
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE doc_id < 100)
      SELECT doc_id,
             array_to_string(list_transform(ws[1:5], w -> CAST(length(w) AS VARCHAR)), '|') AS lens5,
             array_to_string(list_filter(ws[1:8], w -> length(w) > 3), '|') AS long8,
             len(list_filter(ws, w -> w = 'data')) > 0 AS has_data,
             CAST(coalesce(list_position(ws, list_filter(ws, w -> length(w) > 4)[1]), 0) AS BIGINT) AS fidx
      FROM d ORDER BY doc_id""",

    "ds_distinct_window" -> """
      WITH first_seen AS (
        SELECT o_orderpriority, o_custkey,
               min(month(o_orderdate)) AS first_m
        FROM orders WHERE year(o_orderdate) = 1996
        GROUP BY o_orderpriority, o_custkey),
      per_month AS (
        SELECT o_orderpriority, first_m AS m, count(*) AS n_new
        FROM first_seen GROUP BY o_orderpriority, first_m)
      SELECT o_orderpriority, m,
             CAST(sum(n_new) OVER (PARTITION BY o_orderpriority ORDER BY m
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_cust
      FROM per_month ORDER BY o_orderpriority, m""",

    // PERMISSIVE contract: a malformed typed field poisons the row
    // (corrupt-record), a missing trailing column null-fills and keeps it
    "src_csv_malformed" -> """
      SELECT CAST(1 AS BIGINT) AS n_bad, CAST(4 AS BIGINT) AS n_good,
             CAST(10.5 + 7.25 + 2.5 AS DOUBLE) AS sum_ok""",

    "fn_decimal38" -> """
      SELECT l_linestatus,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,2))
                           * CAST(l_quantity AS DECIMAL(10,2))) AS DECIMAL(38,4)) AS VARCHAR) AS big_sum,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,10))) AS DECIMAL(38,10)) AS VARCHAR) AS wide_sum,
             CAST(max(CAST(l_extendedprice AS DECIMAL(20,10)) * CAST(100000000 AS DECIMAL(9,0)))
                  AS VARCHAR) AS scaled_max
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",

    "fn_string3" -> """
      SELECT n_nationkey,
             CAST(coalesce(list_position(string_split(concat('X,', n_name, ',Y'), ','), n_name), 0) AS INT) AS fis,
             concat('[', repeat(' ', CAST(n_nationkey % 3 AS INT)), ']') AS sp,
             length(n_name) AS cl,
             n_name AS aes_rt,
             strftime(TIMESTAMP '2026-08-12 09:05:03', '%Y-%m-%d %H:%M:%S') AS dfm,
             strftime(DATE '2026-02-01', '%d/%m/%y') AS dfm2
      FROM nation ORDER BY n_nationkey""",

    "src_partition_overwrite" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(SUM(CAST(CASE WHEN o_orderpriority = '1-URGENT'
                           THEN o_totalprice * 2 ELSE o_totalprice END
                      AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "src_schema_evolution" -> """
      SELECT coalesce(n_regionkey, -1) AS rk, count(*) AS n, min(n_name) AS mn
      FROM (SELECT n_nationkey, n_name, NULL AS n_regionkey FROM nation WHERE n_nationkey < 10
            UNION ALL
            SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_nationkey >= 10) u
      GROUP BY rk ORDER BY rk"""
  )
}
