package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-4 geo sweep (reference: be/src/exprs/function/geo/ over
  * Google S2). WKT-string geometry; sphere math = S2Earth (R = 6371.01
  * km). Oracle = pinned vectors (the distance pin 7336.9136 m is the
  * reference's own documented ST_Distance_Sphere example value).
  */
object Round4eQueries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_point_wkt" -> sql("""
      SELECT n_nationkey,
             st_point(CAST(n_nationkey AS DOUBLE), CAST(n_regionkey AS DOUBLE)) AS pt,
             st_x(st_point(CAST(n_nationkey AS DOUBLE) + 0.5, 2.0)) AS px,
             st_y(st_point(1.0, CAST(n_regionkey AS DOUBLE) + 0.25)) AS py,
             st_astext(concat('POINT(', CAST(n_nationkey AS STRING), ' 2)')) AS canon,
             st_aswkt('LINESTRING(0 0, 1 0, 1 1)') AS line,
             st_geometryfromtext('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))') AS poly,
             st_linefromtext('POINT(1 1)') AS line_bad,
             st_polygonfromtext('POLYGON((0 0, 5 0, 5 5, 0 5, 0 0))') AS poly2,
             st_geometrytype('POINT(3 4)') AS gt_pt,
             st_geometrytype('LINESTRING(0 0, 2 2)') AS gt_ln,
             st_numpoints('LINESTRING(0 0, 1 0, 1 1)') AS np,
             st_npoints('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))') AS np2
      FROM nation ORDER BY n_nationkey"""),

    "geo_sphere" -> sql("""
      SELECT round(st_distance_sphere(116.35620117, 39.939093,
                                      116.4274406433, 39.9020987219), 4) AS dist,
             round(st_angle_sphere(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                                   CAST(45 AS DOUBLE), CAST(0 AS DOUBLE)), 6) AS ang,
             round(st_angle(st_point(1.0, 0.0), st_point(0.0, 0.0),
                            st_point(0.0, 1.0)), 6) AS angle3,
             round(st_azimuth(st_point(0.0, 0.0), st_point(1.0, 0.0)), 6) AS az_e,
             round(st_azimuth(st_point(0.0, 0.0), st_point(0.0, 1.0)), 6) AS az_n,
             round(st_length('LINESTRING(0 0, 1 0, 1 1)'), 4) AS len,
             round(st_area_square_meters('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'), 1) AS am,
             round(st_area_square_km('POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))'), 4) AS akm,
             round(st_area_square_km(st_circle(10.0, 20.0, 1000.0)), 6) AS ackm,
             st_contains('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))',
                         st_point(5.0, 5.0)) AS c_in,
             st_contains('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))',
                         st_point(5.0, 15.0)) AS c_out,
             st_contains(st_circle(0.0, 0.0, 200000.0), st_point(1.0, 1.0)) AS c_circ,
             st_disjoint('POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))',
                         st_point(15.0, 5.0)) AS dj,
             st_intersects(st_circle(0.0, 0.0, 100000.0), st_point(0.1, 0.1)) AS ix"""),

    // SM3/SM4 pinned to the GB/T standard vectors + roundtrip over the
    // nation fixture
    "fn_sm_crypto" -> sql("""
      SELECT n_nationkey,
             sm3('abc') AS sm3_abc,
             sm3sum('') AS sm3_empty,
             hex(sm4_encrypt_block(unhex('0123456789ABCDEFFEDCBA9876543210'),
                                   unhex('0123456789ABCDEFFEDCBA9876543210'))) AS sm4_vec,
             sm4_decrypt(sm4_encrypt(n_name, '0123456789abcdef'),
                         '0123456789abcdef') AS rt,
             sm4_decrypt(sm4_encrypt(n_name, 'short'), 'short') AS bad_key,
             length(sm4_encrypt(n_name, '0123456789abcdef')) AS clen
      FROM nation ORDER BY n_nationkey""")
  )

  def oracle: Map[String, String] = Map(
    "geo_point_wkt" -> """
      SELECT n_nationkey,
             concat('POINT (', CAST(n_nationkey AS VARCHAR), ' ',
                    CAST(n_regionkey AS VARCHAR), ')') AS pt,
             CAST(n_nationkey AS DOUBLE) + 0.5 AS px,
             CAST(n_regionkey AS DOUBLE) + 0.25 AS py,
             concat('POINT (', CAST(n_nationkey AS VARCHAR), ' 2)') AS canon,
             'LINESTRING (0 0, 1 0, 1 1)' AS line,
             'POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))' AS poly,
             CAST(NULL AS VARCHAR) AS line_bad,
             'POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))' AS poly2,
             'ST_Point' AS gt_pt, 'ST_LineString' AS gt_ln,
             CAST(3 AS INT) AS np, CAST(5 AS INT) AS np2
      FROM nation ORDER BY n_nationkey""",

    "geo_sphere" -> """
      SELECT 7336.9136 AS dist,
             45.0 AS ang,
             4.712389 AS angle3,
             1.570796 AS az_e,
             0.0 AS az_n,
             222390.2024 AS len,
             12364036567.1 AS am,
             12364.0366 AS akm,
             3.141593 AS ackm,
             true AS c_in, false AS c_out, true AS c_circ,
             true AS dj, true AS ix""",

    "fn_sm_crypto" -> """
      SELECT n_nationkey,
             '66c7f0f462eeedd9d1f2d46bdc10e4e24167c4875cf2f7a2297da02b8f4ba8e0' AS sm3_abc,
             '1ab21d8355cfa17f8e61194831e81a8f22bec8c728fefb747ed035eb5082aa2b' AS sm3_empty,
             '681EDF34D206965E86B3E94F536E4246' AS sm4_vec,
             n_name AS rt,
             CAST(NULL AS VARCHAR) AS bad_key,
             CAST(CASE WHEN length(n_name) < 16 THEN 16 ELSE 32 END AS INT) AS clen
      FROM nation ORDER BY n_nationkey"""
  )
}
