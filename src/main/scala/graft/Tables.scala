package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    val normalized = df.schema.fields.foldLeft(df) {
      // The driver has regenerated events.ts across rounds as
      // TIMESTAMP(NANOS) surfaced as nanos-long, and later as
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ.
      // Normalize both encodings to a plain micros TimestampType so every
      // consumer (unix_micros, withWatermark, the DuckDB oracle's
      // CAST(ts AS TIMESTAMP)) sees identical values regardless of the
      // fixture vintage. The session TZ is pinned to UTC (GraftSession),
      // so NTZ→TimestampType preserves every field value exactly.
      case (d, f) if name == "events" && f.name == "ts" && f.dataType == LongType =>
        // integer div — a double division would round in the 53-bit
        // mantissa at ~1.7e18 ns and shift timestamps by ±1 us.
        d.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case (d, f) if name == "events" && f.name == "ts" && f.dataType == TimestampNTZType =>
        d.withColumn("ts", col("ts").cast(TimestampType))
      case (d, _) => d
    }
    assertSchema(name, normalized)
    normalized
  }

  /** Post-normalization schema contract per fixture table. A silent
    * driver-side fixture regeneration (new column type, renamed column)
    * must fail HERE, once, with the full diff — not as N scattered
    * analysis errors in whichever queries happen to touch the changed
    * column (round-6 lesson: 18 queries crashed individually and
    * vanished from CORRECTNESS). Timestamp columns accept either
    * TimestampType or TimestampNTZType where downstream code tolerates
    * both; events.ts is pinned to TimestampType by the normalization
    * above. */
  private val expected: Map[String, Seq[(String, DataType => Boolean)]] = {
    def is(t: DataType): DataType => Boolean = _ == t
    val anyTs: DataType => Boolean =
      dt => dt == TimestampType || dt == TimestampNTZType
    Map(
      "region" -> Seq("r_regionkey" -> is(IntegerType), "r_name" -> is(StringType)),
      "nation" -> Seq("n_nationkey" -> is(IntegerType), "n_name" -> is(StringType),
        "n_regionkey" -> is(IntegerType)),
      "customer" -> Seq("c_custkey" -> is(LongType), "c_name" -> is(StringType),
        "c_nationkey" -> is(IntegerType), "c_acctbal" -> is(DoubleType),
        "c_mktsegment" -> is(StringType)),
      "supplier" -> Seq("s_suppkey" -> is(LongType), "s_name" -> is(StringType),
        "s_nationkey" -> is(IntegerType), "s_acctbal" -> is(DoubleType)),
      "part" -> Seq("p_partkey" -> is(LongType), "p_name" -> is(StringType),
        "p_brand" -> is(StringType), "p_type" -> is(StringType),
        "p_size" -> is(IntegerType), "p_retailprice" -> is(DoubleType)),
      "orders" -> Seq("o_orderkey" -> is(LongType), "o_custkey" -> is(LongType),
        "o_orderstatus" -> is(StringType), "o_totalprice" -> is(DoubleType),
        "o_orderdate" -> anyTs, "o_orderpriority" -> is(StringType)),
      "lineitem" -> Seq("l_orderkey" -> is(LongType), "l_partkey" -> is(LongType),
        "l_suppkey" -> is(LongType), "l_linenumber" -> is(IntegerType),
        "l_quantity" -> is(DoubleType), "l_extendedprice" -> is(DoubleType),
        "l_discount" -> is(DoubleType), "l_tax" -> is(DoubleType),
        "l_returnflag" -> is(StringType), "l_linestatus" -> is(StringType),
        "l_shipdate" -> anyTs),
      "events" -> Seq("event_id" -> is(LongType), "ts" -> is(TimestampType),
        "user_id" -> is(LongType), "event_type" -> is(StringType),
        "value" -> is(DoubleType), "props" -> is(StringType)),
      "documents" -> Seq("doc_id" -> is(LongType), "text" -> is(StringType),
        "lang" -> is(StringType), "source" -> is(StringType),
        "n_chars" -> is(LongType)),
      "embeddings" -> Seq("vec_id" -> is(LongType),
        "embedding" -> is(ArrayType(FloatType)), "label" -> is(IntegerType)))
  }

  private def assertSchema(name: String, df: DataFrame): Unit =
    expected.get(name).foreach { exp =>
      val actual = df.schema.fields.map(f => f.name -> f.dataType).toMap
      val problems = exp.flatMap { case (cn, ok) =>
        actual.get(cn) match {
          case None => Some(s"$cn: MISSING")
          case Some(dt) if !ok(dt) => Some(s"$cn: unexpected type $dt")
          case _ => None
        }
      }
      if (problems.nonEmpty)
        throw new IllegalStateException(
          s"fixture schema drift in table '$name' — the driver likely " +
          s"regenerated the parquet fixtures with new types; update " +
          s"Tables.load0 normalization + Tables.expected. Diff: " +
          problems.mkString("; ") +
          s". Actual schema: ${df.schema.simpleString}")
    }

  /** Register every fixture as a temp view (for spark.sql use). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
