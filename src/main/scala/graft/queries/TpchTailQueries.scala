package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TPC-H q2 and q11 — the two battery entries the fixture schema could
  * not express directly (both read `partsupp`, which the driver's
  * star schema omits). Re-expressed with the part-supplier association
  * derived from lineitem: ps_supplycost = min unit price ever charged
  * by that supplier for that part (q2), and part value = total
  * extended price supplied (q11). With these the TPC-H battery is
  * 22/22 query shapes.
  *
  * q2's supplycost stays pure DOUBLE end-to-end (min is selection, not
  * summation, so no cross-engine float drift; DECIMAL division would
  * hit engine-specific result-scale rules). q11's money goes through
  * the usual exact-DECIMAL-sum-then-DOUBLE spelling.
  *
  * Reference shapes: tools/tpch-tools/queries/q2.sql, q11.sql.
  */
object TpchTailQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // q2: min-cost supplier per part in one region (correlated min over
    // the derived part-supplier cost association)
    "q2_min_cost_supplier" -> """
      WITH ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey)
      SELECT CAST(s_acctbal AS DOUBLE) AS s_acctbal, s_name, n_name, p_partkey, p_type,
             CAST(ps_supplycost AS DOUBLE) AS supplycost
      FROM part JOIN ps ON p_partkey = ps_partkey
           JOIN supplier ON s_suppkey = ps_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
        AND ps_supplycost = (SELECT min(ps2.ps_supplycost)
                             FROM ps ps2 JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
                                  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                                  JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                             WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      LIMIT 100""",

    // q11: parts whose supplied value from one nation exceeds a
    // fraction of that nation's total supplied value
    "q11_part_value_share" -> """
      SELECT l_partkey AS ps_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY l_partkey
      HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) >
             (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))) AS DOUBLE) * 0.001
              FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                   JOIN nation ON n_nationkey = s_nationkey
              WHERE n_name = 'NATION_7')
      ORDER BY part_value DESC, ps_partkey
      LIMIT 100"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
