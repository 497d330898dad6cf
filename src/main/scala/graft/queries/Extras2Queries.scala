package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.TableModels
import Q._

/** Second extras sweep: _foreach combinator (elementwise agg over
  * array columns — reference: ForEachCombinator.java), width_bucket,
  * provably-empty relations (EmptySetSourceOperatorX
  * empty_set_operator.h:35), and the UNIQUE-model merge-on-write
  * materialization path (write the merged table, then read it back).
  */
object Extras2Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // sum_foreach / avg_foreach: per-index aggregation over arrays.
    "x2_agg_foreach" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        WITH arrs AS (
          SELECT l_returnflag,
                 array(CAST(l_quantity AS BIGINT),
                       CAST(l_linenumber AS BIGINT),
                       CAST(pmod(l_partkey, 10) AS BIGINT)) AS a
          FROM lineitem),
        pos AS (SELECT l_returnflag, idx, v FROM arrs
                LATERAL VIEW posexplode(a) p AS idx, v),
        agg AS (SELECT l_returnflag, idx, CAST(sum(v) AS BIGINT) AS s, count(*) AS c
                FROM pos GROUP BY l_returnflag, idx)
        SELECT l_returnflag,
               max(CASE WHEN idx = 0 THEN s END) AS sum_qty,
               max(CASE WHEN idx = 1 THEN s END) AS sum_ln,
               max(CASE WHEN idx = 2 THEN s END) AS sum_pk,
               round(CAST(max(CASE WHEN idx = 0 THEN s END) AS DOUBLE)
                     / max(CASE WHEN idx = 0 THEN c END), 6) AS avg_qty,
               round(CAST(max(CASE WHEN idx = 1 THEN s END) AS DOUBLE)
                     / max(CASE WHEN idx = 1 THEN c END), 6) AS avg_ln,
               round(CAST(max(CASE WHEN idx = 2 THEN s END) AS DOUBLE)
                     / max(CASE WHEN idx = 2 THEN c END), 6) AS avg_pk
        FROM agg GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    "x2_width_bucket" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT width_bucket(c_acctbal, 0.0, 10000.0, 10) AS bucket,
               count(*) AS n, count_if(c_acctbal < 0) AS n_neg
        FROM customer GROUP BY bucket ORDER BY bucket""")
    }),

    // provably-empty relation still yields the full (empty) shape.
    "x2_empty_set" -> ((s, dir) => {
      t(s, dir, "customer").filter(lit(false))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // merge-on-write: materialize the merged UNIQUE table (the Doris
    // MoW write path), read the written parquet back, aggregate.
    "x2_unique_mow" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val base = o.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1).as("seq"))
      val upd = o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), lit("M").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"), lit(2).as("seq"))
      val out = "target/sources/unique_mow"
      TableModels.uniqueView(base.union(upd), Seq("o_orderkey"), "seq")
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), dbl(sum(money(col("o_totalprice")))).as("tot"))
        .orderBy(col("o_orderstatus"))
    })
  )

  def oracle: Map[String, String] = Map(
    "x2_agg_foreach" -> """
      WITH pos AS (
        SELECT l_returnflag, u.idx - 1 AS idx, u.v FROM (
          SELECT l_returnflag,
                 unnest([CAST(l_quantity AS BIGINT),
                         CAST(l_linenumber AS BIGINT),
                         CAST(l_partkey % 10 AS BIGINT)]) AS v,
                 generate_subscripts([1, 2, 3], 1) AS idx
          FROM lineitem) u),
      agg AS (SELECT l_returnflag, idx, CAST(sum(v) AS BIGINT) AS s, count(*) AS c
              FROM pos GROUP BY l_returnflag, idx)
      SELECT l_returnflag,
             max(CASE WHEN idx = 0 THEN s END) AS sum_qty,
             max(CASE WHEN idx = 1 THEN s END) AS sum_ln,
             max(CASE WHEN idx = 2 THEN s END) AS sum_pk,
             round(CAST(max(CASE WHEN idx = 0 THEN s END) AS DOUBLE)
                   / max(CASE WHEN idx = 0 THEN c END), 6) AS avg_qty,
             round(CAST(max(CASE WHEN idx = 1 THEN s END) AS DOUBLE)
                   / max(CASE WHEN idx = 1 THEN c END), 6) AS avg_ln,
             round(CAST(max(CASE WHEN idx = 2 THEN s END) AS DOUBLE)
                   / max(CASE WHEN idx = 2 THEN c END), 6) AS avg_pk
      FROM agg GROUP BY l_returnflag ORDER BY l_returnflag""",

    "x2_width_bucket" -> """
      SELECT CAST(CASE WHEN c_acctbal < 0 THEN 0
                       WHEN c_acctbal >= 10000 THEN 11
                       ELSE floor(c_acctbal / 1000.0) + 1 END AS BIGINT) AS bucket,
             count(*) AS n, CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_neg
      FROM customer GROUP BY bucket ORDER BY bucket""",

    "x2_empty_set" -> """
      SELECT c_mktsegment, count(*) AS n FROM customer
      WHERE false GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "x2_unique_mow" -> """
      WITH loads AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS seq FROM orders
        UNION ALL
        SELECT o_orderkey, 'M', o_totalprice * 2, 2 FROM orders WHERE o_orderkey % 3 = 0),
      v AS (SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        FROM loads) x WHERE rn = 1)
      SELECT o_orderstatus, count(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
      FROM v GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  )
}
