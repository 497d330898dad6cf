package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Round-2 coverage sweep:
  *  - JDBC source/sink via embedded Derby (reference: JdbcScanOperatorX
  *    be/src/exec/operator/jdbc_scan_operator.h, jdbc external table) —
  *    fills the one §2.1 row previously marked "not replicated".
  *  - PIVOT / UNPIVOT relational ops (reference: nereids pivot rewrite;
  *    Spark-side: RelationalGroupedDataset.pivot / Dataset.unpivot).
  *  - IGNORE NULLS window navigation (first/last/nth_value — reference:
  *    window_function_first_last.h FIRST_VALUE/LAST_VALUE ignore-null
  *    variants).
  *  - JSON shape functions json_keys/json_array_length (reference:
  *    function_json.cpp json_keys/json_length).
  *  - bitmap string codec + slicing (bitmap_from_string/bitmap_to_string/
  *    sub_bitmap/bitmap_subset_in_range — function_bitmap.cpp).
  *  - Doris-named datetime floor/ceil UDFs (hour_floor/day_ceil/... —
  *    function_datetime_floor_ceil.cpp).
  *  - document fingerprinting via rolling polynomial hash (north-star
  *    text-pipeline op; md5-derived word hashes keep both engines exact).
  *  - two-phase exact quantile merge (quantile_union/_percent pattern —
  *    aggregate_function_quantile_state.h): shard partials, merge, final.
  */
object Round2Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_jdbc_roundtrip" -> ((s, dir) => {
      val url = "jdbc:derby:target/sources/derbydb;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      t(s, dir, "nation").write.mode("overwrite").jdbc(url, "nation_jdbc", props)
      s.read.jdbc(url, "nation_jdbc", props)
        .groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("sk"),
          min(col("n_name")).as("mn"))
        .orderBy(col("n_regionkey"))
    }),

    "ds_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))
    }),

    "ds_unpivot" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("price"),
          col("o_custkey").cast("double").as("cust"))
        .unpivot(Array(col("o_orderkey")), Array(col("price"), col("cust")),
          "metric", "val")
        .orderBy(col("o_orderkey"), col("metric"))
    }),

    "win_ignore_nulls" -> sql("""
      SELECT o_orderkey,
             last_value(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END)
               IGNORE NULLS OVER w AS last_nn,
             first_value(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END)
               IGNORE NULLS OVER w AS first_nn,
             nth_value(o_orderstatus, 2) OVER w AS nth2
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey"""),

    "dj_json_shape" -> sql("""
      WITH j AS (
        SELECT event_id,
               concat('{"a":', CAST(event_id % 5 AS STRING),
                      ',"tags":[1,2', CASE WHEN event_id % 2 = 0 THEN ',3' ELSE '' END,
                      '],"z":"s"}') AS doc
        FROM events WHERE event_id < 300)
      SELECT event_id,
             array_join(json_object_keys(doc), '|') AS ks,
             json_array_length(get_json_object(doc, '$.tags')) AS tlen
      FROM j ORDER BY event_id"""),

    "fq_bitmap_string" -> sql("""
      WITH b AS (SELECT n_regionkey AS rk, bitmap_agg(n_nationkey) AS bm
                 FROM nation GROUP BY n_regionkey)
      SELECT rk,
             bitmap_to_string(bm) AS all_keys,
             bitmap_to_string(sub_bitmap(bm, 1, 3)) AS sub3,
             bitmap_to_string(bitmap_subset_in_range(bm, 5, 15)) AS in_range,
             bitmap_count(bitmap_remove(bm, rk * 5)) AS n_removed,
             bitmap_has_all(bm, bitmap_from_string(CAST(rk AS STRING))) AS has_rk,
             bitmap_xor_count(bm, bitmap_from_string('0,1,2')) AS xc
      FROM b ORDER BY rk"""),

    "fn_datetime_floor_named" -> sql("""
      SELECT event_id,
             unix_micros(hour_floor(ts)) AS hf,
             unix_micros(day_floor(ts)) AS df,
             unix_micros(minute_floor(ts)) AS mf,
             unix_micros(hour_ceil(ts)) AS hc,
             unix_micros(day_ceil(ts)) AS dc,
             unix_micros(minute_ceil(ts)) AS mc,
             unix_micros(hour_ceil(TIMESTAMP '1969-12-31 23:30:00')) AS hc_neg,
             unix_micros(hour_ceil(TIMESTAMP '1969-12-31 23:00:00')) AS hc_neg_aligned,
             unix_micros(minute_ceil(TIMESTAMP '1969-12-31 23:30:30')) AS mc_neg,
             unix_micros(day_ceil(TIMESTAMP '1969-12-30 12:00:00')) AS dc_neg
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    "ml_fingerprint" -> sql("""
      SELECT doc_id,
             aggregate(
               transform(split(text, ' '),
                 w -> CAST(conv(substring(md5(w), 1, 14), 16, 10) AS BIGINT) % 1000000000000),
               CAST(0 AS BIGINT),
               (h, x) -> (h * 31 + x) % 1000000000000) AS fp
      FROM documents WHERE doc_id < 200 ORDER BY doc_id"""),

    "state_quantile" -> sql("""
      WITH shard AS (
        SELECT l_returnflag, pmod(l_orderkey, 8) AS sh,
               sort_array(collect_list(CAST(l_quantity AS INT))) AS vs
        FROM lineitem GROUP BY l_returnflag, pmod(l_orderkey, 8)),
      merged AS (
        SELECT l_returnflag, flatten(collect_list(vs)) AS vs
        FROM shard GROUP BY l_returnflag)
      SELECT l_returnflag,
             round(percentile(v, 0.5), 6) AS p50,
             round(percentile(v, 0.9), 6) AS p90,
             count(*) AS n
      FROM (SELECT l_returnflag, explode(vs) AS v FROM merged) x
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  def oracle: Map[String, String] = Map(
    "src_jdbc_roundtrip" -> """
      SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS sk,
             min(n_name) AS mn
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "ds_pivot" -> """
      SELECT o_orderpriority,
             CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
             CAST(count_if(o_orderstatus = 'O') AS BIGINT) AS n_o,
             CAST(count_if(o_orderstatus = 'P') AS BIGINT) AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "ds_unpivot" -> """
      SELECT o_orderkey, metric, val FROM (
        SELECT o_orderkey, 'price' AS metric, CAST(o_totalprice AS DOUBLE) AS val
        FROM orders WHERE o_orderkey < 2000
        UNION ALL
        SELECT o_orderkey, 'cust', CAST(o_custkey AS DOUBLE)
        FROM orders WHERE o_orderkey < 2000) u
      ORDER BY o_orderkey, metric""",

    "win_ignore_nulls" -> """
      SELECT o_orderkey,
             last_value(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END IGNORE NULLS)
               OVER w AS last_nn,
             first_value(CASE WHEN o_orderkey % 3 = 0 THEN o_orderstatus END IGNORE NULLS)
               OVER w AS first_nn,
             nth_value(o_orderstatus, 2) OVER w AS nth2
      FROM orders WHERE o_orderkey < 2000
      WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY o_orderkey""",

    "dj_json_shape" -> """
      WITH j AS (
        SELECT event_id,
               concat('{"a":', CAST(event_id % 5 AS VARCHAR),
                      ',"tags":[1,2', CASE WHEN event_id % 2 = 0 THEN ',3' ELSE '' END,
                      '],"z":"s"}') AS doc
        FROM events WHERE event_id < 300)
      SELECT event_id,
             array_to_string(json_keys(doc), '|') AS ks,
             CAST(json_array_length(doc, '$.tags') AS INT) AS tlen
      FROM j ORDER BY event_id""",

    "fq_bitmap_string" -> """
      WITH b AS (SELECT n_regionkey AS rk, list_sort(list(DISTINCT n_nationkey)) AS ks
                 FROM nation GROUP BY n_regionkey)
      SELECT rk,
             array_to_string(ks, ',') AS all_keys,
             array_to_string(ks[2:4], ',') AS sub3,
             array_to_string(list_filter(ks, x -> x >= 5 AND x < 15), ',') AS in_range,
             CAST(len(list_filter(ks, x -> x <> rk * 5)) AS BIGINT) AS n_removed,
             list_contains(ks, rk) AS has_rk,
             CAST(len(list_filter(ks, x -> NOT list_contains([0,1,2], x)))
                  + len(list_filter([0,1,2], x -> NOT list_contains(ks, x))) AS BIGINT) AS xc
      FROM b ORDER BY rk""",

    "fn_datetime_floor_named" -> """
      SELECT event_id,
             epoch_us(date_trunc('hour', ts)) AS hf,
             epoch_us(date_trunc('day', ts)) AS df,
             epoch_us(date_trunc('minute', ts)) AS mf,
             ((epoch_us(ts) + 3599999999) // 3600000000) * 3600000000 AS hc,
             ((epoch_us(ts) + 86399999999) // 86400000000) * 86400000000 AS dc,
             ((epoch_us(ts) + 59999999) // 60000000) * 60000000 AS mc,
             CAST(0 AS BIGINT) AS hc_neg,
             CAST(-3600000000 AS BIGINT) AS hc_neg_aligned,
             CAST(-1740000000 AS BIGINT) AS mc_neg,
             CAST(-86400000000 AS BIGINT) AS dc_neg
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "ml_fingerprint" -> """
      SELECT doc_id,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(text, ' '),
                   w -> CAST(concat('0x', substr(md5(w), 1, 14)) AS BIGINT) % 1000000000000)),
               (h, x) -> (h * 31 + x) % 1000000000000) AS fp
      FROM documents WHERE doc_id < 200 ORDER BY doc_id""",

    "state_quantile" -> """
      SELECT l_returnflag,
             round(quantile_cont(CAST(l_quantity AS INT), 0.5), 6) AS p50,
             round(quantile_cont(CAST(l_quantity AS INT), 0.9), 6) AS p90,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
