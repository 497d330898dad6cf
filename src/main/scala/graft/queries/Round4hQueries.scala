package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 exact-name aggregate sweep: every remaining
  * BuiltinAggregateFunctions name now runs under its own Doris
  * spelling — parameterized forms (window/mode/pattern/k/width/decay)
  * take their constants as leading arguments the way the reference FE
  * passes them (read from rows; the FE guarantees literals).
  */
object Round4hQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_named_stats" -> sql("""
      SELECT l_returnflag,
             round(avg_weighted(CAST(l_quantity AS DOUBLE),
                                CAST(l_linenumber AS DOUBLE)), 6) AS aw,
             round(covar(CAST(l_quantity AS DOUBLE),
                         CAST(l_linenumber AS DOUBLE)), 6) AS cv,
             round(variance_pop(CAST(l_quantity AS DOUBLE)), 6) AS vp,
             round(variance_samp(CAST(l_quantity AS DOUBLE)), 6) AS vs,
             round(skew(CAST(l_quantity AS DOUBLE)), 6) AS sk,
             round(skew_pop(CAST(l_quantity AS DOUBLE)), 6) AS skp,
             round(kurt(CAST(l_quantity AS DOUBLE)), 6) AS kt,
             round(sem(CAST(l_quantity AS DOUBLE)), 6) AS se,
             group_bit_and(l_linenumber) AS gba,
             group_bit_or(l_linenumber) AS gbo,
             group_bit_xor(l_linenumber) AS gbx,
             size(group_array(l_orderkey)) AS ga_n,
             concat_ws(',', transform(
               percentile_array(CAST(l_quantity AS INT), array(0.25, 0.75)),
               x -> CAST(round(x, 6) AS STRING))) AS pa,
             round(percentile_reservoir(CAST(l_quantity AS INT),
                                        CAST(0.5 AS DOUBLE)), 6) AS pr
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),

    "agg_named_map" -> sql("""
      WITH d AS (SELECT n_regionkey, n_nationkey, n_name FROM nation)
      SELECT n_regionkey,
             concat_ws('|', transform(
               array_sort(map_keys(map_agg(n_nationkey, n_name))),
               k -> concat(CAST(k AS STRING), '=',
                           element_at(map_agg(n_nationkey, n_name), k)))) AS ma
      FROM d GROUP BY n_regionkey ORDER BY n_regionkey"""),

    "agg_named_behavior" -> sql("""
      SELECT user_id,
             window_funnel(CAST(259200 AS BIGINT), 'default', ts,
               event_type = 'view', event_type = 'click',
               event_type = 'purchase') AS lvl,
             window_funnel_v1(CAST(259200 AS BIGINT), 'default', ts,
               event_type = 'view', event_type = 'click',
               event_type = 'purchase') AS lvl1,
             window_funnel_v2(CAST(259200 AS BIGINT), 'default', ts,
               event_type = 'view', event_type = 'click',
               event_type = 'purchase') AS lvl2,
             array_join(transform(retention(
               event_type = 'signup', event_type = 'click',
               event_type = 'purchase'),
               x -> CAST(x AS STRING)), '|') AS ret,
             sequence_match('(?1)(?2)', unix_micros(ts),
               event_type = 'signup', event_type = 'purchase', false) AS m_sp,
             sequence_count('(?1)(?2)', unix_micros(ts),
               event_type = 'view', event_type = 'click', false) AS c_vc
      FROM events GROUP BY user_id ORDER BY user_id"""),

    "agg_named_topn" -> sql("""
      SELECT lang,
             topn(word, 3) AS tj,
             concat_ws(',', topn_array(word, 3)) AS ta,
             concat_ws(',', topn_weighted(word, CAST(length(word) AS BIGINT), 3)) AS tw
      FROM (SELECT lang, explode(split(text, ' ')) AS word FROM documents) w
      WHERE word != '' GROUP BY lang ORDER BY lang"""),

    "agg_named_sketch" -> sql("""
      WITH shard AS (
        SELECT l_returnflag, pmod(l_orderkey, 2) AS sh,
               bitmap_agg(pmod(l_suppkey, 10)) AS bm,
               hll_sketch_agg(pmod(l_partkey, 300)) AS hs
        FROM lineitem GROUP BY l_returnflag, pmod(l_orderkey, 2))
      SELECT l_returnflag,
             bitmap_union_count(bm) AS buc,
             orthogonal_bitmap_union_count(bm) AS obuc,
             bitmap_to_string(bitmap_intersect(bm)) AS bi,
             intersect_count(bm, CAST(sh AS STRING), '0', '1') AS ic,
             CAST(ds_hll_estimate(datasketches_hll_union_agg(hs)) AS BIGINT) AS ndv_part
      FROM shard GROUP BY l_returnflag ORDER BY l_returnflag"""),

    "agg_named_ema_hist" -> sql("""
      SELECT user_id,
             round(exponential_moving_average(CAST(4 AS DOUBLE), value,
               CAST(event_id % 64 AS DOUBLE)), 6) AS ema,
             linear_histogram(value, CAST(200 AS DOUBLE)) AS lh,
             histogram(CAST(round(value, 0) AS DOUBLE), 4) AS h,
             group_concat(event_type, '~') AS gc,
             ai_agg(event_type, 'summarize') AS aia
      FROM events WHERE event_id < 400 GROUP BY user_id ORDER BY user_id""")
  )

  def oracle: Map[String, String] = Map(
    "agg_named_stats" -> """
      WITH m AS (SELECT l_returnflag AS k, avg(CAST(l_quantity AS DOUBLE)) AS mu
                 FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
             round(sum(CAST(l_quantity AS DOUBLE) * l_linenumber)
                   / sum(CAST(l_linenumber AS DOUBLE)), 6) AS aw,
             round(covar_pop(CAST(l_quantity AS DOUBLE),
                             CAST(l_linenumber AS DOUBLE)), 6) AS cv,
             round(var_pop(CAST(l_quantity AS DOUBLE)), 6) AS vp,
             round(var_samp(CAST(l_quantity AS DOUBLE)), 6) AS vs,
             round(avg(pow(l_quantity - mu, 3))
                   / pow(avg(pow(l_quantity - mu, 2)), 1.5), 6) AS sk,
             round(avg(pow(l_quantity - mu, 3))
                   / pow(avg(pow(l_quantity - mu, 2)), 1.5), 6) AS skp,
             round(kurtosis_pop(CAST(l_quantity AS DOUBLE)), 6) AS kt,
             round(stddev_samp(CAST(l_quantity AS DOUBLE)) / sqrt(count(*)), 6) AS se,
             bit_and(l_linenumber) AS gba,
             bit_or(l_linenumber) AS gbo,
             bit_xor(l_linenumber) AS gbx,
             count(*) AS ga_n,
             concat(CAST(round(quantile_cont(CAST(l_quantity AS INT), 0.25), 6) AS VARCHAR),
                    ',',
                    CAST(round(quantile_cont(CAST(l_quantity AS INT), 0.75), 6) AS VARCHAR)) AS pa,
             round(quantile_cont(CAST(l_quantity AS INT), 0.5), 6) AS pr
      FROM lineitem JOIN m ON l_returnflag = m.k
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    "agg_named_map" -> """
      SELECT n_regionkey,
             string_agg(concat(CAST(n_nationkey AS VARCHAR), '=', n_name),
                        '|' ORDER BY n_nationkey) AS ma
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",

    "agg_named_behavior" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      l1 AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view'),
      l2 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 3 DAY),
      l3 AS (SELECT DISTINCT e1.user_id FROM events e1
             JOIN events e2 ON e2.user_id = e1.user_id
             JOIN events e3 ON e3.user_id = e1.user_id
             WHERE e1.event_type = 'view' AND e2.event_type = 'click'
               AND e3.event_type = 'purchase'
               AND e2.ts > e1.ts AND e3.ts > e2.ts
               AND e3.ts <= e1.ts + INTERVAL 3 DAY),
      lvl AS (SELECT u.user_id,
                     CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
                          WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
                          WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
                          ELSE 0 END AS lvl
              FROM u),
      vc AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts, CASE event_type WHEN 'view' THEN 1 ELSE 2 END) AS prev
        FROM events WHERE event_type IN ('view', 'click'))
      SELECT lvl.user_id,
             CAST(lvl.lvl AS INT) AS lvl, CAST(lvl.lvl AS INT) AS lvl1,
             CAST(lvl.lvl AS INT) AS lvl2,
             (SELECT CASE WHEN bool_or(e.event_type = 'signup') THEN 'true' ELSE 'false' END
                || '|' ||
                CASE WHEN bool_or(e.event_type = 'signup')
                      AND bool_or(e.event_type = 'click') THEN 'true' ELSE 'false' END
                || '|' ||
                CASE WHEN bool_or(e.event_type = 'signup')
                      AND bool_or(e.event_type = 'purchase') THEN 'true' ELSE 'false' END
              FROM events e WHERE e.user_id = lvl.user_id) AS ret,
             (SELECT CAST(bool_or(EXISTS (
                SELECT 1 FROM events e1 JOIN events e2 ON e2.user_id = e1.user_id
                WHERE e1.user_id = lvl.user_id AND e1.event_type = 'signup'
                  AND e2.event_type = 'purchase' AND e2.ts > e1.ts)) AS BIGINT)
              FROM events e WHERE e.user_id = lvl.user_id) AS m_sp,
             (SELECT CAST(coalesce(count_if(et.event_type = 'click' AND et.prev = 'view'), 0) AS BIGINT)
              FROM vc et WHERE et.user_id = lvl.user_id) AS c_vc
      FROM lvl ORDER BY lvl.user_id""",

    "agg_named_topn" -> """
      WITH w AS (SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents),
      c AS (SELECT lang, word, count(*) AS cnt, sum(length(word)) AS wsum
            FROM w WHERE word != '' GROUP BY lang, word),
      r AS (SELECT lang, word, cnt, wsum,
                   row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rn,
                   row_number() OVER (PARTITION BY lang ORDER BY wsum DESC, word) AS rw
            FROM c)
      SELECT lang,
             (SELECT concat('{', string_agg(concat('"', word, '":', CAST(cnt AS VARCHAR)),
                     ',' ORDER BY rn), '}')
              FROM r r2 WHERE r2.lang = r.lang AND rn <= 3) AS tj,
             (SELECT string_agg(word, ',' ORDER BY rn)
              FROM r r2 WHERE r2.lang = r.lang AND rn <= 3) AS ta,
             (SELECT string_agg(word, ',' ORDER BY rw)
              FROM r r2 WHERE r2.lang = r.lang AND rw <= 3) AS tw
      FROM (SELECT DISTINCT lang FROM r) r ORDER BY lang""",

    "agg_named_sketch" -> """
      WITH vals AS (
        SELECT l_returnflag, l_orderkey % 2 AS sh, l_suppkey % 10 AS v
        FROM lineitem),
      per_shard AS (SELECT DISTINCT l_returnflag, sh, v FROM vals)
      SELECT g.l_returnflag,
             (SELECT count(DISTINCT v) FROM vals
              WHERE vals.l_returnflag = g.l_returnflag) AS buc,
             (SELECT count(DISTINCT v) FROM vals
              WHERE vals.l_returnflag = g.l_returnflag) AS obuc,
             coalesce((SELECT array_to_string(list_sort(list(v)), ',') FROM (
                SELECT v FROM per_shard p
                WHERE p.l_returnflag = g.l_returnflag
                GROUP BY v HAVING count(*) = (
                  SELECT count(DISTINCT sh) FROM per_shard p2
                  WHERE p2.l_returnflag = g.l_returnflag)) q), '') AS bi,
             (SELECT count(*) FROM (
                SELECT v FROM per_shard p
                WHERE p.l_returnflag = g.l_returnflag
                GROUP BY v HAVING count(DISTINCT sh) = 2) q) AS ic,
             (SELECT count(DISTINCT l_partkey % 300) FROM lineitem l
              WHERE l.l_returnflag = g.l_returnflag) AS ndv_part
      FROM (SELECT DISTINCT l_returnflag FROM lineitem) g
      ORDER BY g.l_returnflag""",

    "agg_named_ema_hist" -> """
      WITH e AS (SELECT user_id, event_id, value, event_type,
                        CAST(event_id % 64 AS DOUBLE) AS t
                 FROM events WHERE event_id < 400),
      mt AS (SELECT user_id, max(t) AS tmax FROM e GROUP BY user_id),
      lh AS (SELECT user_id, floor(value / 200.0) AS k, count(*) AS c
             FROM e GROUP BY user_id, floor(value / 200.0)),
      lhs AS (SELECT user_id, k, c,
                     sum(c) OVER (PARTITION BY user_id ORDER BY k) AS acc
              FROM lh),
      hv AS (SELECT user_id, CAST(round(value, 0) AS DOUBLE) AS v FROM e),
      hn AS (SELECT user_id, count(*) AS n FROM hv GROUP BY user_id),
      ht AS (SELECT hv.user_id, v,
                    ntile(CASE WHEN hn.n < 4 THEN CAST(hn.n AS INT) ELSE 4 END)
                      OVER (PARTITION BY hv.user_id ORDER BY v) AS bk
             FROM hv JOIN hn ON hv.user_id = hn.user_id),
      hb AS (SELECT user_id, bk, min(v) AS lo, max(v) AS hi, count(*) AS c,
                    count(DISTINCT v) AS nd
             FROM ht GROUP BY user_id, bk),
      hbs AS (SELECT user_id, bk, lo, hi, c, nd,
                     sum(c) OVER (PARTITION BY user_id ORDER BY bk) AS pre
              FROM hb)
      SELECT mt.user_id,
             (SELECT round(sum(value * pow(2, -(mt.tmax - t) / 4.0))
                           * (1 - pow(2, -1.0 / 4.0)), 6)
              FROM e WHERE e.user_id = mt.user_id) AS ema,
             (SELECT concat('{"num_buckets":', CAST(count(*) AS VARCHAR), ',"buckets":[',
                     string_agg(concat('{"lower":', CAST(k * 200.0 AS VARCHAR),
                       ',"upper":', CAST((k + 1) * 200.0 AS VARCHAR),
                       ',"count":', CAST(c AS VARCHAR),
                       ',"acc_count":', CAST(acc AS VARCHAR), '}'), ',' ORDER BY k),
                     ']}')
              FROM lhs WHERE lhs.user_id = mt.user_id) AS lh,
             (SELECT concat('{"num_buckets":', CAST(count(*) AS VARCHAR), ',"buckets":[',
                     string_agg(concat('{"lower":', CAST(lo AS VARCHAR),
                       ',"upper":', CAST(hi AS VARCHAR),
                       ',"count":', CAST(c AS VARCHAR),
                       ',"pre_sum":', CAST(pre AS VARCHAR),
                       ',"ndv":', CAST(nd AS VARCHAR), '}'), ',' ORDER BY bk),
                     ']}')
              FROM hbs WHERE hbs.user_id = mt.user_id) AS h,
             (SELECT string_agg(event_type, '~' ORDER BY event_type)
              FROM e WHERE e.user_id = mt.user_id) AS gc,
             (SELECT concat('[summarize] n=', CAST(count(*) AS VARCHAR),
                            ' min=', min(event_type), ' max=', max(event_type))
              FROM e WHERE e.user_id = mt.user_id) AS aia
      FROM mt ORDER BY mt.user_id"""
  )
}
