package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 closing TPC-DS-pattern batch (reference:
  * regression-test/suites/tpcds_sf1_p1 query shapes) — the analytic
  * idioms the earlier ds_* battery did not yet pin:
  *  - share-of-total over a rollup (window over grouped rollup rows);
  *  - correlated EXISTS / NOT EXISTS chain (DS q10/q35 family);
  *  - chained CTE reused by two consumers joined back (DS q2/q59
  *    family — the multicast shape in pure SQL).
  */
object Round4iQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ds_rollup_share" -> sql("""
      WITH g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS rev
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus))
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
             coalesce(l_linestatus, 'ALL') AS ls,
             round(rev, 2) AS rev,
             round(100 * rev / sum(CASE WHEN l_returnflag IS NULL
                                        AND l_linestatus IS NULL
                                        THEN rev ELSE 0 END) OVER (), 6) AS pct_of_total
      FROM g ORDER BY rf, ls"""),

    "ds_exists_chain" -> sql("""
      SELECT c_mktsegment, count(*) AS n, min(c_custkey) AS mn
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""),

    "ds_cte_reuse2" -> sql("""
      WITH monthly AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey, date_trunc('month', o_orderdate)),
      firsts AS (SELECT o_custkey, min(m) AS m0 FROM monthly GROUP BY o_custkey)
      SELECT CAST(CAST(f.m0 AS DATE) AS STRING) AS cohort,
             count(DISTINCT f.o_custkey) AS n_cust,
             CAST(sum(CASE WHEN mo.m = f.m0 THEN mo.cents ELSE 0 END) AS BIGINT)
               AS first_month_cents,
             CAST(sum(mo.cents) AS BIGINT) AS lifetime_cents
      FROM firsts f JOIN monthly mo ON mo.o_custkey = f.o_custkey
      GROUP BY f.m0 ORDER BY cohort""")
  )

  def oracle: Map[String, String] = Map(
    "ds_rollup_share" -> """
      WITH g AS (
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS rev,
               grouping(l_returnflag) AS gr, grouping(l_linestatus) AS gl
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus))
      SELECT CASE WHEN gr = 1 THEN 'ALL' ELSE l_returnflag END AS rf,
             CASE WHEN gl = 1 THEN 'ALL' ELSE l_linestatus END AS ls,
             round(rev, 2) AS rev,
             round(100 * rev / sum(CASE WHEN gr = 1 AND gl = 1
                                        THEN rev ELSE 0 END) OVER (), 6) AS pct_of_total
      FROM g ORDER BY rf, ls""",

    "ds_exists_chain" -> """
      SELECT c_mktsegment, count(*) AS n, min(c_custkey) AS mn
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "ds_cte_reuse2" -> """
      WITH monthly AS (
        SELECT o_custkey, date_trunc('month', o_orderdate) AS m,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey, date_trunc('month', o_orderdate)),
      firsts AS (SELECT o_custkey, min(m) AS m0 FROM monthly GROUP BY o_custkey)
      SELECT CAST(CAST(f.m0 AS DATE) AS STRING) AS cohort,
             count(DISTINCT f.o_custkey) AS n_cust,
             CAST(sum(CASE WHEN mo.m = f.m0 THEN mo.cents ELSE 0 END) AS BIGINT)
               AS first_month_cents,
             CAST(sum(mo.cents) AS BIGINT) AS lifetime_cents
      FROM firsts f JOIN monthly mo ON mo.o_custkey = f.o_custkey
      GROUP BY f.m0 ORDER BY cohort"""
  )
}
