package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** Histogram / EMA / count_by_enum + agg-state combinator battery
  * (reference: combinator framework
  * nereids/trees/expressions/functions/combinator/{State,Merge,Union}
  * Combinator.java — partial states as first-class values).
  */
object StateQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "state_linear_histogram" -> sql("""
      SELECT c_mktsegment,
             concat_ws('|', transform(linear_histogram_100(c_acctbal),
               h -> concat(CAST(CAST(h.lower AS BIGINT) AS STRING), '-',
                           CAST(CAST(h.upper AS BIGINT) AS STRING), ':',
                           CAST(h.cnt AS STRING)))) AS hist
      FROM customer WHERE c_acctbal >= 0
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    "state_ema" -> sql("""
      SELECT user_id, round(ema3(unix_micros(ts), value), 6) AS ema
      FROM events WHERE event_type = 'view'
      GROUP BY user_id ORDER BY user_id"""),

    "state_count_by_enum" -> sql("""
      SELECT user_id,
             concat_ws('|', transform(count_by_enum(event_type),
               e -> concat(e.item, ':', CAST(e.cnt AS STRING)))) AS cbe
      FROM events WHERE user_id < 30
      GROUP BY user_id ORDER BY user_id"""),

    // the _state/_union/_merge combinator pattern end-to-end: shard
    // partials (state), merge states across shards (union), finalize
    // (merge) — over both a struct-state (avg) and a binary-state
    // (bitmap) aggregate.
    "state_combinators" -> sql("""
      WITH shard_states AS (
        SELECT l_returnflag, pmod(l_orderkey, 8) AS shard,
               named_struct('s', SUM(CAST(l_quantity AS DECIMAL(12,2))),
                            'c', count(*)) AS avg_state,
               bitmap_agg(l_suppkey) AS bm_state
        FROM lineitem GROUP BY l_returnflag, pmod(l_orderkey, 8))
      SELECT l_returnflag,
             CAST(CAST(SUM(avg_state.s) AS DOUBLE) / SUM(avg_state.c) AS DOUBLE) AS avg_merged,
             SUM(avg_state.c) AS n,
             bitmap_count(bitmap_union(bm_state)) AS nd_supp
      FROM shard_states GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // HLL sketch surface (datasketches): exact in sparse mode at this
    // cardinality, so the count-distinct oracle holds.
    "state_hll" -> sql("""
      WITH nation_sketch AS (
        SELECT c_nationkey, pmod(c_nationkey, 5) AS region_bucket,
               hll_sketch_agg(c_custkey) AS hs
        FROM customer GROUP BY c_nationkey, pmod(c_nationkey, 5))
      SELECT region_bucket,
             hll_cardinality(hll_union_agg(hs)) AS nd
      FROM nation_sketch GROUP BY region_bucket ORDER BY region_bucket"""),

    // scalar HLL constructors (hll_hash/hll_empty, Doris function_hll
    // .cpp) feeding the native union/cardinality path — per-row
    // sketches merge exactly like Doris HLL columns under HLL_UNION;
    // sparse-mode sketches are exact at these cardinalities.
    "state_hll_scalar" -> sql("""
      WITH r AS (SELECT pmod(c_nationkey, 5) AS bucket,
                        hll_hash(CAST(c_custkey AS STRING)) AS h
                 FROM customer)
      SELECT bucket,
             hll_cardinality(hll_union_agg(h)) AS nd,
             hll_cardinality(hll_union(hll_union_agg(h), hll_empty())) AS nd_u
      FROM r GROUP BY bucket ORDER BY bucket""")
  )

  def oracle: Map[String, String] = Map(
    "state_linear_histogram" -> """
      WITH b AS (
        SELECT c_mktsegment, CAST(floor(c_acctbal / 100.0) AS BIGINT) AS k, count(*) AS c
        FROM customer WHERE c_acctbal >= 0
        GROUP BY c_mktsegment, k)
      SELECT c_mktsegment,
             string_agg(CAST(k * 100 AS VARCHAR) || '-' ||
                        CAST((k + 1) * 100 AS VARCHAR) || ':' ||
                        CAST(c AS VARCHAR), '|' ORDER BY k) AS hist
      FROM b GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "state_ema" -> """
      SELECT user_id,
             round(list_reduce(list(value ORDER BY ts),
                               (a, b) -> 0.3 * b + 0.7 * a), 6) AS ema
      FROM events WHERE event_type = 'view'
      GROUP BY user_id ORDER BY user_id""",

    "state_count_by_enum" -> """
      WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events
                 WHERE user_id < 30 GROUP BY user_id, event_type)
      SELECT user_id, string_agg(event_type || ':' || CAST(n AS VARCHAR), '|' ORDER BY event_type) AS cbe
      FROM c GROUP BY user_id ORDER BY user_id""",

    "state_combinators" -> """
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_merged,
             count(*) AS n,
             count(DISTINCT l_suppkey) AS nd_supp
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "state_hll" -> """
      SELECT c_nationkey % 5 AS region_bucket, count(DISTINCT c_custkey) AS nd
      FROM customer GROUP BY region_bucket ORDER BY region_bucket""",

    "state_hll_scalar" -> """
      SELECT c_nationkey % 5 AS bucket,
             count(DISTINCT c_custkey) AS nd,
             count(DISTINCT c_custkey) AS nd_u
      FROM customer GROUP BY bucket ORDER BY bucket"""
  )
}
