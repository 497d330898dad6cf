package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SSB battery — all 13 star-schema-benchmark queries plus one
  * flat-variant representative per flight (the reference ships both:
  * tools/ssb-tools/ssb-queries/q{1.1..4.3}.sql and
  * tools/ssb-tools/ssb-flat-queries/ over the denormalized
  * lineorder_flat wide table).
  *
  * Fixture mapping: lineorder = lineitem JOIN orders (lo_revenue =
  * extendedprice * (1 - discount), lo_supplycost = 60% of list — SSB
  * generates supplycost as a fixed fraction too), dates = year()/
  * month()/weekofyear() on o_orderdate, p_category = p_type, p_mfgr =
  * the leading brand digit, city = nation x market-segment (customer
  * side) / nation x suppkey-decile (supplier side). Money follows the
  * exact-DECIMAL-sum-then-DOUBLE house spelling; SSB discount bands
  * 1..3 become 0.01..0.03 (the fixture stores rates).
  */
object SsbQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  private val bothEngines: Map[String, String] = Map(

    // flight 1: date/discount/quantity band revenue scan (q1.1)
    "ssb_q1_1" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE year(o_orderdate) = 1996
        AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25""",

    // q1.2: the yearmonth cut
    "ssb_q1_2" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE year(o_orderdate) = 1996 AND month(o_orderdate) = 1
        AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 26 AND 35""",

    // q1.3: the week-in-year cut
    "ssb_q1_3" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE weekofyear(o_orderdate) = 6 AND year(o_orderdate) = 1996
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity BETWEEN 26 AND 35""",

    // flight 2 (q2.1): (year, brand) revenue, category selector
    "ssb_q2_1" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lo_revenue,
             year(o_orderdate) AS d_year, p_brand
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE p_type = 'MEDIUM' AND r_name = 'AMERICA'
      GROUP BY year(o_orderdate), p_brand
      ORDER BY p_brand, d_year""",

    // q2.2: brand-range selector
    "ssb_q2_2" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lo_revenue,
             year(o_orderdate) AS d_year, p_brand
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE p_brand BETWEEN 'Brand#21' AND 'Brand#28' AND r_name = 'ASIA'
      GROUP BY year(o_orderdate), p_brand
      ORDER BY d_year, p_brand""",

    // q2.3: brand point selector
    "ssb_q2_3" -> """
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lo_revenue,
             year(o_orderdate) AS d_year, p_brand
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN part ON p_partkey = l_partkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation ON n_nationkey = s_nationkey
           JOIN region ON r_regionkey = n_regionkey
      WHERE p_brand = 'Brand#19' AND r_name = 'EUROPE'
      GROUP BY year(o_orderdate), p_brand
      ORDER BY d_year, p_brand""",

    // flight 3 (q3.1): customer-geo x supplier-geo x year at region grain
    "ssb_q3_1" -> """
      SELECT cn.n_name AS c_nation, sn.n_name AS s_nation, year(o_orderdate) AS d_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN region cr ON cr.r_regionkey = cn.n_regionkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
           JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      WHERE cr.r_name = 'ASIA' AND sr.r_name = 'ASIA'
        AND year(o_orderdate) BETWEEN 1995 AND 2000
      GROUP BY cn.n_name, sn.n_name, year(o_orderdate)
      ORDER BY d_year ASC, revenue DESC, c_nation, s_nation""",

    // q3.2: nation grain with composite city output
    "ssb_q3_2" -> """
      SELECT concat(cn.n_name, '-', c_mktsegment) AS c_city,
             concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) AS s_city,
             year(o_orderdate) AS d_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE cn.n_name = 'NATION_9' AND sn.n_name = 'NATION_9'
        AND year(o_orderdate) BETWEEN 1995 AND 2000
      GROUP BY concat(cn.n_name, '-', c_mktsegment),
               concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)), year(o_orderdate)
      ORDER BY d_year ASC, revenue DESC, c_city, s_city""",

    // q3.3: city-pair selector
    "ssb_q3_3" -> """
      SELECT concat(cn.n_name, '-', c_mktsegment) AS c_city,
             concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) AS s_city,
             year(o_orderdate) AS d_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE (concat(cn.n_name, '-', c_mktsegment) = 'NATION_1-BUILDING'
             OR concat(cn.n_name, '-', c_mktsegment) = 'NATION_5-MACHINERY')
        AND (concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) LIKE 'NATION_1-%'
             OR concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) LIKE 'NATION_5-%')
        AND year(o_orderdate) BETWEEN 1995 AND 2000
      GROUP BY concat(cn.n_name, '-', c_mktsegment),
               concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)), year(o_orderdate)
      ORDER BY d_year ASC, revenue DESC, c_city, s_city""",

    // q3.4: the yearmonth city cut
    "ssb_q3_4" -> """
      SELECT concat(cn.n_name, '-', c_mktsegment) AS c_city,
             concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) AS s_city,
             year(o_orderdate) AS d_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE (concat(cn.n_name, '-', c_mktsegment) = 'NATION_1-BUILDING'
             OR concat(cn.n_name, '-', c_mktsegment) = 'NATION_5-MACHINERY')
        AND year(o_orderdate) = 1997 AND month(o_orderdate) = 12
      GROUP BY concat(cn.n_name, '-', c_mktsegment),
               concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)), year(o_orderdate)
      ORDER BY d_year ASC, revenue DESC, c_city, s_city""",

    // flight 4 (q4.1): profit (revenue - 60% supplycost) by customer nation
    "ssb_q4_1" -> """
      SELECT year(o_orderdate) AS d_year, cn.n_name AS c_nation,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_extendedprice AS DECIMAL(16,2))
                      * CAST(0.60 AS DECIMAL(4,2))) AS DOUBLE) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN part ON p_partkey = l_partkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN region cr ON cr.r_regionkey = cn.n_regionkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
           JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        AND substring(p_brand, 7, 1) IN ('1', '2')
      GROUP BY year(o_orderdate), cn.n_name
      ORDER BY d_year, c_nation""",

    // q4.2: by supplier nation x category, two years
    "ssb_q4_2" -> """
      SELECT year(o_orderdate) AS d_year, sn.n_name AS s_nation, p_type AS p_category,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_extendedprice AS DECIMAL(16,2))
                      * CAST(0.60 AS DECIMAL(4,2))) AS DOUBLE) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN part ON p_partkey = l_partkey
           JOIN nation cn ON cn.n_nationkey = c_nationkey
           JOIN region cr ON cr.r_regionkey = cn.n_regionkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
           JOIN region sr ON sr.r_regionkey = sn.n_regionkey
      WHERE cr.r_name = 'AMERICA' AND sr.r_name = 'AMERICA'
        AND year(o_orderdate) IN (1997, 1998)
        AND substring(p_brand, 7, 1) IN ('1', '2')
      GROUP BY year(o_orderdate), sn.n_name, p_type
      ORDER BY d_year, s_nation, p_category""",

    // q4.3: by supplier city x brand
    "ssb_q4_3" -> """
      SELECT year(o_orderdate) AS d_year,
             concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)) AS s_city, p_brand,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_extendedprice AS DECIMAL(16,2))
                      * CAST(0.60 AS DECIMAL(4,2))) AS DOUBLE) AS profit
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN supplier ON s_suppkey = l_suppkey
           JOIN part ON p_partkey = l_partkey
           JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE sn.n_name = 'NATION_3'
        AND year(o_orderdate) IN (1997, 1998)
        AND p_type = 'ECONOMY'
      GROUP BY year(o_orderdate),
               concat(sn.n_name, '-', CAST(s_suppkey % 10 AS STRING)), p_brand
      ORDER BY d_year, s_city, p_brand""",

    // flat variant of q1.1 over the denormalized lineorder_flat CTE
    "ssb_flat_q1_1" -> """
      WITH lineorder_flat AS (
        SELECT o_orderdate, l_extendedprice, l_discount, l_quantity,
               p_brand, p_type, substring(p_brand, 7, 1) AS p_mfgr,
               cn.n_name AS c_nation, cr.r_name AS c_region,
               sn.n_name AS s_nation, sr.r_name AS s_region
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region cr ON cr.r_regionkey = cn.n_regionkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN region sr ON sr.r_regionkey = sn.n_regionkey)

      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineorder_flat
      WHERE year(o_orderdate) = 1996
        AND l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 25""",

    // flat variant of q2.1
    "ssb_flat_q2_1" -> """
      WITH lineorder_flat AS (
        SELECT o_orderdate, l_extendedprice, l_discount, l_quantity,
               p_brand, p_type, substring(p_brand, 7, 1) AS p_mfgr,
               cn.n_name AS c_nation, cr.r_name AS c_region,
               sn.n_name AS s_nation, sr.r_name AS s_region
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region cr ON cr.r_regionkey = cn.n_regionkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN region sr ON sr.r_regionkey = sn.n_regionkey)

      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lo_revenue,
             year(o_orderdate) AS d_year, p_brand
      FROM lineorder_flat
      WHERE p_type = 'MEDIUM' AND s_region = 'AMERICA'
      GROUP BY year(o_orderdate), p_brand
      ORDER BY p_brand, d_year""",

    // flat variant of q3.1
    "ssb_flat_q3_1" -> """
      WITH lineorder_flat AS (
        SELECT o_orderdate, l_extendedprice, l_discount, l_quantity,
               p_brand, p_type, substring(p_brand, 7, 1) AS p_mfgr,
               cn.n_name AS c_nation, cr.r_name AS c_region,
               sn.n_name AS s_nation, sr.r_name AS s_region
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region cr ON cr.r_regionkey = cn.n_regionkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN region sr ON sr.r_regionkey = sn.n_regionkey)

      SELECT c_nation, s_nation, year(o_orderdate) AS d_year,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      FROM lineorder_flat
      WHERE c_region = 'ASIA' AND s_region = 'ASIA'
        AND year(o_orderdate) BETWEEN 1995 AND 2000
      GROUP BY c_nation, s_nation, year(o_orderdate)
      ORDER BY d_year ASC, revenue DESC, c_nation, s_nation""",

    // flat variant of q4.1
    "ssb_flat_q4_1" -> """
      WITH lineorder_flat AS (
        SELECT o_orderdate, l_extendedprice, l_discount, l_quantity,
               p_brand, p_type, substring(p_brand, 7, 1) AS p_mfgr,
               cn.n_name AS c_nation, cr.r_name AS c_region,
               sn.n_name AS s_nation, sr.r_name AS s_region
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             JOIN customer ON c_custkey = o_custkey
             JOIN supplier ON s_suppkey = l_suppkey
             JOIN part ON p_partkey = l_partkey
             JOIN nation cn ON cn.n_nationkey = c_nationkey
             JOIN region cr ON cr.r_regionkey = cn.n_regionkey
             JOIN nation sn ON sn.n_nationkey = s_nationkey
             JOIN region sr ON sr.r_regionkey = sn.n_regionkey)

      SELECT year(o_orderdate) AS d_year, c_nation,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                    - CAST(l_extendedprice AS DECIMAL(16,2))
                      * CAST(0.60 AS DECIMAL(4,2))) AS DOUBLE) AS profit
      FROM lineorder_flat
      WHERE c_region = 'AMERICA' AND s_region = 'AMERICA' AND p_mfgr IN ('1', '2')
      GROUP BY year(o_orderdate), c_nation
      ORDER BY d_year, c_nation"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    bothEngines.map { case (k, q) => k -> sql(q) }

  def oracle: Map[String, String] = bothEngines
}
