package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RecursiveCte

/** SQL-level WITH RECURSIVE (plans/RecursiveSql.scala): the injected
  * pre-pass must run standard recursive-CTE SQL — UNION and UNION ALL
  * semantics, parenthesized sub-blocks inside legs, trailing plain
  * CTEs — and fail loudly at the depth cap instead of truncating. */
class RecursiveSqlSpec extends AnyFunSuite {
  import TestSpark._

  test("UNION DISTINCT fixpoint matches the API-level iterate") {
    // the model_recursive_cte oracle text, now runnable HERE too
    val sql = """
      WITH RECURSIVE r(n) AS (
        SELECT 1
        UNION
        SELECT x FROM (
          SELECT n * 2 AS x FROM r WHERE n * 2 <= 2000
          UNION ALL
          SELECT n * 3 FROM r WHERE n * 3 <= 2000) t)
      SELECT n FROM r ORDER BY n"""
    val viaSql = spark.sql(sql).collect().map(_.getInt(0)).toSeq
    val viaApi = RecursiveCte.iterate(
        spark.range(1, 2).select(col("id").cast("int").as("n")),
        d => d.select((col("n") * 2).as("n"))
          .union(d.select((col("n") * 3).as("n")))
          .filter(col("n") <= 2000))
      .orderBy(col("n")).collect().map(_.getInt(0)).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.head == 1 && viaSql.contains(1536) && !viaSql.exists(_ > 2000))
  }

  test("UNION ALL ladder with a trailing plain CTE and a fixture join") {
    Tables.registerAll(spark, sf)
    val sql = """
      WITH RECURSIVE m(k) AS (
        SELECT CAST(0 AS BIGINT)
        UNION ALL
        SELECT k + 1 FROM m WHERE k < 4
      ), big AS (
        SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100
      )
      SELECT k, count(o_orderkey) AS n
      FROM m LEFT JOIN big ON o_orderkey % 5 = k
      GROUP BY k ORDER BY k"""
    val rows = spark.sql(sql).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    val total = rows.map(_.getLong(1)).sum
    val expected = spark.sql(
      "SELECT count(*) FROM orders WHERE o_totalprice > 100").head().getLong(0)
    assert(total == expected)
  }

  test("UNION ALL bag semantics keep duplicates") {
    val sql = """
      WITH RECURSIVE t(n, s) AS (
        SELECT 1, 1
        UNION ALL
        SELECT n + 1, 1 FROM t WHERE n < 3
      )
      SELECT CAST(count(*) AS BIGINT) AS c, CAST(sum(s) AS BIGINT) AS ss FROM t"""
    val r = spark.sql(sql).head()
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
  }

  test("depth guard: a non-converging recursion fails, not truncates") {
    spark.conf.set("spark.graft.recursiveCte.maxDepth", "10")
    try {
      val e = intercept[IllegalStateException] {
        spark.sql("""
          WITH RECURSIVE t(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM t
          ) SELECT count(*) FROM t""").collect()
      }
      assert(e.getMessage.contains("maxDepth"), e.getMessage)
    } finally spark.conf.unset("spark.graft.recursiveCte.maxDepth")
  }

  test("anchor-less recursion is rejected") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("""
        WITH RECURSIVE t(n) AS (
          SELECT n + 1 FROM t WHERE n < 3
        ) SELECT * FROM t""").collect()
    }
    assert(e.getMessage.contains("anchor"), e.getMessage)
  }

  test("plain CTE BEFORE the recursive one, and chained recursive CTEs") {
    // standard grammar: RECURSIVE flags the whole list; any CTE may be
    // plain, and a later recursive CTE may read an earlier one
    val sql = """
      WITH RECURSIVE base(b) AS (
        SELECT 2
      ), powers(n) AS (
        SELECT b FROM base
        UNION ALL
        SELECT n * 2 FROM powers WHERE n < 50
      ), offsets(o) AS (
        SELECT n + 1 FROM powers
        UNION
        SELECT o + 100 FROM offsets WHERE o < 200
      )
      SELECT CAST(count(*) AS BIGINT) AS c, CAST(sum(o) AS BIGINT) AS s
      FROM offsets"""
    val r = spark.sql(sql).head()
    // powers = 2,4,8,16,32,64; offsets anchor = 3,5,9,17,33,65, closed
    // under o -> o+100 for o < 200: each anchor yields +100 and +200
    // (the guard filters the SOURCE row) -> 18 rows
    val anchors = Seq(3, 5, 9, 17, 33, 65)
    assert(r.getLong(0) == 18)
    assert(r.getLong(1) == anchors.map(a => 3 * a + 300).sum)
  }

  test("non-recursive WITH is untouched by the pre-pass") {
    Tables.registerAll(spark, sf)
    val n = spark.sql("""
      WITH x AS (SELECT o_orderkey FROM orders LIMIT 5)
      SELECT count(*) AS n FROM x""").head().getLong(0)
    assert(n == 5)
  }
}
