package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TableModels
import Q._

/** Final sweep: the reference's unique-key TPC-H variant pattern
  * (regression-test/suites/tpch_sf0.1_unique_p1/ — same queries over
  * UNIQUE-keys tables), 64-bit bitmap ids (Roaring64 beyond int
  * range), and funnel window-size sensitivity.
  */
object Final1Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H q1 over a UNIQUE-keys lineitem with a second load updating
    // a slice — the read must see merged state (unique-variant suite).
    "f1_tpch_q1_unique" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
      val base = l.select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"), lit(1).as("seq"))
      val upd = l.filter(col("l_orderkey") % 11 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          lit("U").as("l_returnflag"), col("l_linestatus"),
          (col("l_quantity") + 1).as("l_quantity"), col("l_extendedprice"),
          lit(2).as("seq"))
      // fixture (orderkey, linenumber) is not unique -> deterministic
      // tiebreak over every projected column
      TableModels.uniqueView(base.union(upd),
          Seq("l_orderkey", "l_linenumber"), "seq",
          Seq("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"),
          dbl(sum(money(col("l_extendedprice")))).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // bitmap over ids beyond 32-bit range (Roaring64 path).
    "f1_bitmap_64bit" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_mktsegment,
               bitmap_count(bitmap_agg(c_custkey + 8589934592)) AS nd,
               bitmap_min(bitmap_agg(c_custkey + 8589934592)) AS mn,
               bitmap_max(bitmap_agg(c_custkey + 8589934592)) AS mx,
               bitmap_contains(bitmap_agg(c_custkey + 8589934592), 8589934593) AS has_first
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    // funnel MODES (default vs dedup vs fixed) side by side — rows-only
    // (mode semantics are operational; laws + break vectors are
    // property-tested in FunnelModeProps).
    "f1_funnel_modes" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT lvl_default, lvl_increase, lvl_dedup, lvl_fixed, count(*) AS n_users FROM (
          SELECT user_id,
                 window_funnel_3d(unix_micros(ts), m) AS lvl_default,
                 window_funnel_3d_increase(unix_micros(ts), m) AS lvl_increase,
                 window_funnel_3d_dedup(unix_micros(ts), m) AS lvl_dedup,
                 window_funnel_3d_fixed(unix_micros(ts), m) AS lvl_fixed
          FROM (SELECT user_id, ts,
                       CAST(event_type = 'view' AS INT)
                       + 2 * CAST(event_type = 'click' AS INT)
                       + 4 * CAST(event_type = 'purchase' AS INT) AS m
                FROM events) e
          GROUP BY user_id) u
        GROUP BY lvl_default, lvl_increase, lvl_dedup, lvl_fixed
        ORDER BY lvl_default, lvl_increase, lvl_dedup, lvl_fixed""")
    }),

    // same funnel, 1-hour window: stricter deadline, lower levels.
    "f1_funnel_1h" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT lvl, count(*) AS n_users FROM (
          SELECT user_id,
                 window_funnel_1h(unix_micros(ts),
                   CAST(event_type = 'view' AS INT)
                   + 2 * CAST(event_type = 'click' AS INT)
                   + 4 * CAST(event_type = 'purchase' AS INT)) AS lvl
          FROM events GROUP BY user_id) u
        GROUP BY lvl ORDER BY lvl""")
    })
  )

  def oracle: Map[String, String] = Map(
    "f1_tpch_q1_unique" -> """
      WITH loads AS (
        SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
               l_quantity, l_extendedprice, 1 AS seq FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'U', l_linestatus,
               l_quantity + 1, l_extendedprice, 2 FROM lineitem
        WHERE l_orderkey % 11 = 0),
      v AS (SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                     ORDER BY seq DESC, l_returnflag, l_linestatus,
                                              l_quantity, l_extendedprice) AS rn
        FROM loads) x WHERE rn = 1)
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
             count(*) AS n
      FROM v GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",

    "f1_bitmap_64bit" -> """
      SELECT c_mktsegment, count(DISTINCT c_custkey) AS nd,
             min(c_custkey) + 8589934592 AS mn,
             max(c_custkey) + 8589934592 AS mx,
             bool_or(c_custkey = 1) AS has_first
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "f1_funnel_1h" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      l2 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR),
      l3 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             JOIN events e3 ON e3.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e3.event_type = 'purchase'
               AND e2.ts > e1.ts AND e3.ts > e2.ts
               AND e3.ts <= e1.ts + INTERVAL 1 HOUR),
      lv AS (SELECT u.user_id,
               CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                    WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                    WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                    ELSE 0 END AS lvl
             FROM u)
      SELECT lvl, count(*) AS n_users FROM lv GROUP BY lvl ORDER BY lvl"""
  )
}
