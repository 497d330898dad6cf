package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, RecursiveCte, TableModels}
import Q._

/** As-of join, recursive CTE, and table-model (UNIQUE/AGG finalize)
  * battery. The as-of oracle uses DuckDB's native ASOF JOIN; the
  * recursion oracle uses WITH RECURSIVE — both checking our rewrites
  * against first-class reference implementations.
  */
object ModelQueries {

  /** SQL-level WITH RECURSIVE (plans/RecursiveSql.scala pre-pass): the
    * SAME statement text runs on both engines — DuckDB natively, here
    * via the injected-parser fixpoint. UNION ALL ladder driving a
    * grouped join (bag semantics, data-independent 10-step depth). */
  private val RecSql1 = """
    WITH RECURSIVE m(k) AS (
      SELECT CAST(0 AS BIGINT)
      UNION ALL
      SELECT k + 1 FROM m WHERE k < 9
    )
    SELECT k, count(o_orderkey) AS n,
      CAST(round(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sp
    FROM m LEFT JOIN orders ON o_orderkey % 10 = k
    GROUP BY k ORDER BY k"""

  /** UNION DISTINCT doubling chain walked THROUGH the orders fixture:
    * termination is data-driven (the chain stops at the first missing
    * orderkey), the set semantics dedup across iterations. */
  private val RecSql2 = """
    WITH RECURSIVE chain(k) AS (
      SELECT CAST(1 AS BIGINT)
      UNION
      SELECT o_orderkey FROM orders JOIN chain ON o_orderkey = k * 2
    )
    SELECT count(*) AS n, CAST(max(k) AS BIGINT) AS mx FROM chain"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "model_recursive_cte_sql" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir); s.sql(RecSql1)
    }),
    "model_recursive_cte_sql2" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir); s.sql(RecSql2)
    }),
    // latest prior 'view' for each 'purchase' of the same user.
    "model_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asofBackward(purchases, views, Seq("user_id"), "ts", "ts",
          Seq("value"), inner = false)
        .orderBy(col("event_id"))
    }),

    "model_asof_inner" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("src_id"))
      AsofJoin.asofBackward(purchases, signups, Seq("user_id"), "ts", "ts",
          Seq("src_id"), inner = true)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matched"), max(col("r_src_id")).as("max_src"))
        .orderBy(col("user_id"))
    }),

    // reachability fixpoint: {1} closed under n*2, n*3 up to 2000.
    "model_recursive_cte" -> ((s, dir) => {
      val anchor = s.range(1, 2).select(col("id").cast("int").as("n"))
      RecursiveCte.iterate(anchor, d =>
        d.select((col("n") * 2).as("n"))
          .union(d.select((col("n") * 3).as("n")))
          .filter(col("n") <= 2000))
        .orderBy(col("n"))
    }),

    // UNIQUE-keys model: second load overwrites every 7th order.
    "model_unique_keys" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val base = o.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1).as("seq"))
      val upd = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1000).as("o_totalprice"), lit(2).as("seq"))
      TableModels.uniqueView(base.union(upd), Seq("o_orderkey"), "seq")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dbl(sum(money(col("o_totalprice")))).as("tot"))
        .orderBy(col("o_orderstatus"))
    }),

    // AGG-keys model finalize: SUM/MIN/MAX/REPLACE/REPLACE_IF_NOT_NULL.
    "model_agg_keys" -> ((s, dir) => {
      val l = t(s, dir, "lineitem")
        .withColumn("seq", col("l_orderkey") * 10 + col("l_linenumber"))
        .withColumn("maybe_status", nullif(col("l_linestatus"), lit("O")))
      TableModels.aggView(l, Seq("l_suppkey"), "seq", Seq(
          "l_quantity" -> TableModels.Sum,
          "l_shipdate" -> TableModels.Min,
          "l_extendedprice" -> TableModels.Max,
          "l_returnflag" -> TableModels.Replace,
          "maybe_status" -> TableModels.ReplaceIfNotNull))
        .orderBy(col("l_suppkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "model_asof_join" -> """
      SELECT l.event_id, l.user_id, l.ts, r.value AS r_value
      FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
      ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'view') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id""",

    "model_asof_inner" -> """
      SELECT user_id, count(*) AS n_matched, max(src_id) AS max_src FROM (
        SELECT l.user_id, r.event_id AS src_id
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') l
        ASOF JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') r
          ON l.user_id = r.user_id AND l.ts >= r.ts) x
      GROUP BY user_id ORDER BY user_id""",

    "model_recursive_cte_sql" -> RecSql1,

    "model_recursive_cte_sql2" -> RecSql2,

    "model_recursive_cte" -> """
      WITH RECURSIVE r(n) AS (
        SELECT 1
        UNION
        SELECT x FROM (
          SELECT n * 2 AS x FROM r WHERE n * 2 <= 2000
          UNION ALL
          SELECT n * 3 FROM r WHERE n * 3 <= 2000) t)
      SELECT n FROM r ORDER BY n""",

    "model_unique_keys" -> """
      WITH loads AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS seq FROM orders
        UNION ALL
        SELECT o_orderkey, 'U', o_totalprice + 1000, 2 FROM orders WHERE o_orderkey % 7 = 0),
      v AS (SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM loads) x WHERE rn = 1)
      SELECT o_orderstatus, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM v GROUP BY o_orderstatus ORDER BY o_orderstatus""",

    "model_agg_keys" -> """
      SELECT l_suppkey, sum(l_quantity) AS l_quantity,
             min(l_shipdate) AS l_shipdate,
             max(l_extendedprice) AS l_extendedprice,
             max_by(l_returnflag, l_orderkey * 10 + l_linenumber) AS l_returnflag,
             max_by(nullif(l_linestatus, 'O'), l_orderkey * 10 + l_linenumber)
               FILTER (WHERE nullif(l_linestatus, 'O') IS NOT NULL) AS maybe_status
      FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""
  )
}
