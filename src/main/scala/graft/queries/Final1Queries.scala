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

    // funnel MODES (default vs dedup vs fixed) side by side — oracle'd
    // since r8: each mode's greedy-scan semantics is re-derived in
    // portable SQL (see the oracle), on top of the FunnelModeProps laws.
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

    // The 4-mode matrix re-derived in portable SQL. Events carry
    // single-bit masks (view=1, click=2, purchase=4; others 0), so the
    // impl's (ts, mask) buffer order reduces to ts order with the mask
    // as tiebreak, and "index-after" becomes plain ts comparisons:
    //  - DEFAULT never breaks -> greedy == existential chain.
    //  - INCREASE/DEDUP break at the FIRST next-level occurrence, so
    //    each attempt is deterministic: ct/pt are the first in-window
    //    click/purchase, and the CASE encodes the break rules
    //    (non-strictly-later first hit kills INCREASE; a passed-level
    //    event before the first next-level hit kills DEDUP — including
    //    a second click tied at exactly ct, which sorts adjacent).
    //  - FIXED is lead() adjacency over (ts, mask) INCLUDING mask-0
    //    rows (the impl keeps them only in Fixed mode).
    // W = 3 days = 259200000000 micros.
    "f1_funnel_modes" -> """
      WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts,
               CAST(event_type = 'view' AS INT)
               + 2 * CAST(event_type = 'click' AS INT)
               + 4 * CAST(event_type = 'purchase' AS INT) AS m
        FROM events),
      u AS (SELECT DISTINCT user_id FROM ev),
      s AS (SELECT user_id, ts FROM ev WHERE m = 1),
      def2 AS (SELECT DISTINCT s.user_id FROM s JOIN ev c
               ON c.user_id = s.user_id AND c.m = 2
               AND c.ts >= s.ts AND c.ts <= s.ts + 259200000000),
      def3 AS (SELECT DISTINCT s.user_id FROM s
               JOIN ev c ON c.user_id = s.user_id AND c.m = 2 AND c.ts >= s.ts
               JOIN ev p ON p.user_id = s.user_id AND p.m = 4 AND p.ts >= c.ts
                AND p.ts <= s.ts + 259200000000),
      att0 AS (
        SELECT s.user_id, s.ts,
          (SELECT min(c.ts) FROM ev c WHERE c.user_id = s.user_id AND c.m = 2
            AND c.ts >= s.ts AND c.ts <= s.ts + 259200000000) AS ct
        FROM s),
      att1 AS (
        SELECT a.user_id, a.ts, a.ct,
          (SELECT min(p.ts) FROM ev p WHERE p.user_id = a.user_id AND p.m = 4
            AND p.ts >= a.ct AND p.ts <= a.ts + 259200000000) AS pt,
          (SELECT count(*) FROM ev q WHERE q.user_id = a.user_id AND q.m = 2
            AND q.ts = a.ct) AS nclk,
          EXISTS (SELECT 1 FROM ev v WHERE v.user_id = a.user_id AND v.m = 1
            AND v.ts > a.ts AND v.ts <= a.ct) AS b2
        FROM att0 a),
      inc AS (SELECT user_id,
                CASE WHEN ct IS NULL OR ct <= ts THEN 1
                     WHEN pt IS NULL OR pt <= ct THEN 2 ELSE 3 END AS lvl
              FROM att1),
      ded AS (SELECT a.user_id,
                CASE WHEN a.ct IS NULL OR a.b2 THEN 1
                     WHEN a.pt IS NULL THEN 2
                     WHEN a.nclk > 1 OR EXISTS (
                       SELECT 1 FROM ev q WHERE q.user_id = a.user_id
                       AND q.m IN (1, 2) AND q.ts > a.ct AND q.ts <= a.pt)
                       THEN 2
                     ELSE 3 END AS lvl
              FROM att1 a),
      fx AS (SELECT user_id,
               max(CASE WHEN m1 = 2 AND t1 <= ts + 259200000000 THEN
                     CASE WHEN m2 = 4 AND t2 <= ts + 259200000000 THEN 3 ELSE 2 END
                   ELSE 1 END) AS lvl
             FROM (SELECT user_id, ts, m,
                     lead(m, 1) OVER w AS m1, lead(ts, 1) OVER w AS t1,
                     lead(m, 2) OVER w AS m2, lead(ts, 2) OVER w AS t2
                   FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, m)) z
             WHERE m = 1 GROUP BY user_id),
      per_user AS (
        SELECT u.user_id,
          CASE WHEN u.user_id IN (SELECT user_id FROM def3) THEN 3
               WHEN u.user_id IN (SELECT user_id FROM def2) THEN 2
               WHEN u.user_id IN (SELECT user_id FROM s) THEN 1
               ELSE 0 END AS lvl_default,
          coalesce((SELECT max(lvl) FROM inc WHERE inc.user_id = u.user_id), 0) AS lvl_increase,
          coalesce((SELECT max(lvl) FROM ded WHERE ded.user_id = u.user_id), 0) AS lvl_dedup,
          coalesce((SELECT lvl FROM fx WHERE fx.user_id = u.user_id), 0) AS lvl_fixed
        FROM u)
      SELECT lvl_default, lvl_increase, lvl_dedup, lvl_fixed, count(*) AS n_users
      FROM per_user
      GROUP BY lvl_default, lvl_increase, lvl_dedup, lvl_fixed
      ORDER BY lvl_default, lvl_increase, lvl_dedup, lvl_fixed""",

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
