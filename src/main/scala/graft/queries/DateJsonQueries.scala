package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** date_floor/date_ceil time bucketing (reference:
  * date_time_transforms.h date_trunc/ceil/floor family) and JSON
  * construction (function_to_json.cpp, function_json.cpp
  * json_object/json_array).
  */
object DateJsonQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // arbitrary-interval bucketing: floor/ceil to 4-hour and 15-minute
    // grids (Doris date_floor(ts, INTERVAL n unit)).
    "dj_date_floor_ceil" -> sql("""
      SELECT event_id,
             timestamp_seconds(CAST(unix_micros(ts) div 14400000000 AS BIGINT) * 14400) AS floor_4h,
             timestamp_seconds(CAST(ceil(CAST(unix_micros(ts) AS DOUBLE) / 14400000000.0) AS BIGINT) * 14400) AS ceil_4h,
             timestamp_seconds(CAST(unix_micros(ts) div 900000000 AS BIGINT) * 900) AS floor_15m
      FROM events WHERE event_id < 300 ORDER BY event_id"""),

    // JSON construction: object from struct, array, nested roundtrip.
    "dj_to_json" -> sql("""
      SELECT n_nationkey,
             to_json(named_struct('name', n_name, 'region', n_regionkey)) AS obj,
             to_json(array(n_nationkey, n_regionkey)) AS arr,
             get_json_object(
               to_json(named_struct('a', named_struct('b', n_nationkey))),
               '$.a.b') AS roundtrip
      FROM nation ORDER BY n_nationkey"""),

    // from_json typed extraction (schema-on-read over the props column).
    "dj_from_json" -> sql("""
      SELECT s.k, count(*) AS n FROM (
        SELECT from_json(props, 'k INT') AS s FROM events) t
      GROUP BY s.k ORDER BY s.k""")
  )

  def oracle: Map[String, String] = Map(
    "dj_date_floor_ceil" -> """
      SELECT event_id,
             CAST(to_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 14400000000) * 14400) AS TIMESTAMP) AS floor_4h,
             CAST(to_timestamp(CAST(ceil(epoch_us(CAST(ts AS TIMESTAMP)) / 14400000000.0) AS BIGINT) * 14400) AS TIMESTAMP) AS ceil_4h,
             CAST(to_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900) AS TIMESTAMP) AS floor_15m
      FROM events WHERE event_id < 300 ORDER BY event_id""",

    "dj_to_json" -> """
      SELECT n_nationkey,
             concat('{"name":"', n_name, '","region":', n_regionkey, '}') AS obj,
             concat('[', n_nationkey, ',', n_regionkey, ']') AS arr,
             CAST(n_nationkey AS VARCHAR) AS roundtrip
      FROM nation ORDER BY n_nationkey""",

    "dj_from_json" -> """
      SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n
      FROM events GROUP BY k ORDER BY k"""
  )
}
