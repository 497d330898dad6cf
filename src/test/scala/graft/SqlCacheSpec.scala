package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SqlCache

/** SQL result cache contracts (reference SqlCacheContext: the cache
  * key includes the versions of every table read, so a hit never
  * serves stale data). */
class SqlCacheSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(tag: String): String = {
    val p = s"target/sqlcache_spec/$tag"
    val f = new java.io.File(p)
    if (f.exists()) { import scala.reflect.io.Directory; new Directory(f).deleteRecursively() }
    p
  }

  test("identical plan over unchanged sources hits; changed data invalidates") {
    SqlCache.reset()
    val tbl = freshDir("base")
    spark.range(100).selectExpr("id", "id % 7 AS k")
      .write.mode("overwrite").parquet(tbl)

    def q() = spark.read.parquet(tbl).groupBy("k").agg(sum("id").as("s"))

    val first = SqlCache.cached(q(), freshDir("cache"))
    assert(SqlCache.misses == 1 && SqlCache.hits == 0)
    val firstRows = first.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    val second = SqlCache.cached(q(), freshDir("cache2"))
    assert(SqlCache.hits == 1, "unchanged source must hit")
    val plan = second.queryExecution.executedPlan.toString
    assert(!plan.contains("base"), s"hit must not scan the base table:\n$plan")
    assert(second.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == firstRows)

    // rewrite the source: fingerprint moves, entry must miss and the
    // fresh values must be served (the version-check contract)
    spark.range(200).selectExpr("id", "id % 7 AS k")
      .write.mode("overwrite").parquet(tbl)
    val third = SqlCache.cached(q(), freshDir("cache3"))
    assert(SqlCache.misses == 2, "changed source must miss")
    val total = third.agg(sum("s")).head().getLong(0)
    assert(total == (0L until 200L).sum, s"stale cache served: $total")
  }

  test("different plans do not share an entry") {
    SqlCache.reset()
    val tbl = freshDir("base2")
    spark.range(50).selectExpr("id", "id % 3 AS k")
      .write.mode("overwrite").parquet(tbl)
    val a = SqlCache.cached(
      spark.read.parquet(tbl).groupBy("k").count(), freshDir("cachea"))
    val b = SqlCache.cached(
      spark.read.parquet(tbl).groupBy("k").agg(max("id")), freshDir("cacheb"))
    assert(SqlCache.misses == 2 && SqlCache.hits == 0)
    assert(a.columns.toSeq != b.columns.toSeq)
  }
}
