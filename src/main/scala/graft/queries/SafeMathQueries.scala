package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** group_concat UDAF, 3-step sequence match, and try_* safe-math
  * battery (reference: group_concat with sort combinator; ANSI-error
  * behavior: Doris strict/non-strict cast modes -> Spark try_ family).
  */
object SafeMathQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sm_group_concat_udaf" -> sql("""
      SELECT n_regionkey,
             group_concat_ord(n_name, n_nationkey) AS names_by_key,
             group_concat_distinct_ord(substring(n_name, 1, 1), 0) AS initials
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),

    "sm_sequence_match3" -> sql("""
      SELECT user_id,
             sequence_match3(unix_micros(ts),
               CAST(event_type = 'signup' AS INT)
               + 2 * CAST(event_type = 'view' AS INT)
               + 4 * CAST(event_type = 'purchase' AS INT)) AS m3
      FROM events GROUP BY user_id ORDER BY user_id"""),

    // sequence_match with a 1-hour max-gap guard between consecutive
    // matched events (the "(?t<=N)" pattern guard).
    "sm_sequence_gap" -> sql("""
      SELECT user_id,
             sequence_match2_1h(unix_micros(ts),
               CAST(event_type = 'signup' AS INT)
               + 2 * CAST(event_type = 'purchase' AS INT)) AS m2g,
             sequence_match3_1h(unix_micros(ts),
               CAST(event_type = 'view' AS INT)
               + 2 * CAST(event_type = 'click' AS INT)
               + 4 * CAST(event_type = 'purchase' AS INT)) AS m3g
      FROM events GROUP BY user_id ORDER BY user_id"""),

    "sm_try_math" -> sql("""
      SELECT n_nationkey,
             try_add(9223372036854775807L, CAST(n_nationkey AS BIGINT)) AS ta,
             try_multiply(4611686018427387904L, CAST(n_nationkey AS BIGINT)) AS tm,
             try_divide(CAST(n_nationkey AS DOUBLE), CAST(n_nationkey % 2 AS DOUBLE)) AS td,
             CAST(try_to_number(concat('12', CASE WHEN n_nationkey % 2 = 0 THEN '3' ELSE 'x' END), '999') AS BIGINT) AS tn,
             try_element_at(array(1, 2, 3), CAST(n_nationkey + 1 AS INT)) AS te
      FROM nation ORDER BY n_nationkey""")
  )

  def oracle: Map[String, String] = Map(
    "sm_group_concat_udaf" -> """
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_nationkey) AS names_by_key,
             array_to_string(list_sort(list(DISTINCT substring(n_name, 1, 1))), ',') AS initials
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "sm_sequence_match3" -> """
      SELECT e.user_id,
             CAST(bool_or(EXISTS (
               SELECT 1 FROM events e1
               JOIN events e2 ON e2.user_id = e1.user_id
               JOIN events e3 ON e3.user_id = e1.user_id
               WHERE e1.user_id = e.user_id
                 AND e1.event_type = 'signup' AND e2.event_type = 'view'
                 AND e3.event_type = 'purchase'
                 AND e2.ts > e1.ts AND e3.ts > e2.ts)) AS BIGINT) AS m3
      FROM events e GROUP BY e.user_id ORDER BY e.user_id""",

    "sm_sequence_gap" -> """
      SELECT e.user_id,
             CAST(bool_or(EXISTS (
               SELECT 1 FROM events s JOIN events p ON p.user_id = s.user_id
               WHERE s.user_id = e.user_id
                 AND s.event_type = 'signup' AND p.event_type = 'purchase'
                 AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR)) AS BIGINT) AS m2g,
             CAST(bool_or(EXISTS (
               SELECT 1 FROM events v
               JOIN events c ON c.user_id = v.user_id
               JOIN events p ON p.user_id = v.user_id
               WHERE v.user_id = e.user_id
                 AND v.event_type = 'view' AND c.event_type = 'click'
                 AND p.event_type = 'purchase'
                 AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
                 AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR)) AS BIGINT) AS m3g
      FROM events e GROUP BY e.user_id ORDER BY e.user_id""",

    "sm_try_math" -> """
      SELECT n_nationkey,
             CASE WHEN n_nationkey = 0 THEN 9223372036854775807 END AS ta,
             CASE WHEN n_nationkey <= 1 THEN 4611686018427387904 * n_nationkey END AS tm,
             CASE WHEN n_nationkey % 2 = 1 THEN CAST(n_nationkey AS DOUBLE) END AS td,
             CAST(CASE WHEN n_nationkey % 2 = 0 THEN 123 END AS BIGINT) AS tn,
             CASE WHEN n_nationkey + 1 BETWEEN 1 AND 3 THEN n_nationkey + 1 END AS te
      FROM nation ORDER BY n_nationkey"""
  )
}
