package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Fixture-table access (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under the scale-factor dir. Mirrors the
  * reference's TPC-H-ish regression fixtures
  * (reference: regression-test/suites/nereids_tpch_p0/).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, path): reuses the resolved DataFrame so the
    * parquet FileIndex + footer schema are read once per session — the
    * catalog-metadata caching a metastore would provide (Doris FE keeps
    * tablet metadata resident the same way). */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { case (s, p) => load0(s, p, name) })

  private def load0(spark: SparkSession, path: String, name: String): DataFrame = {
    val df = spark.read.parquet(path)
    // events.ts is TIMESTAMP(NANOS) on disk, surfaced as nanos-long via
    // spark.sql.legacy.parquet.nanosAsLong; normalize to a micros
    // timestamp so queries (and the DuckDB oracle's CAST(ts AS
    // TIMESTAMP)) see identical values.
    df.schema.fields.foldLeft(df) {
      case (d, f) if name == "events" && f.name == "ts" && f.dataType == LongType =>
        // integer div — a double division would round in the 53-bit
        // mantissa at ~1.7e18 ns and shift timestamps by ±1 us.
        d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  /** Register every fixture as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
