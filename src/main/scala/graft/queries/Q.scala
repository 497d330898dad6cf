package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Shared query DSL helpers.
  *
  * Cross-engine exactness rule: monetary aggregates are computed in
  * DECIMAL (exact, associative — summation order cannot change the
  * result) and cast to DOUBLE only at the very end. This makes our
  * results bit-identical to the DuckDB oracle's regardless of partition
  * count / aggregation order, which a naive sum(double) would not be.
  */
object Q {
  def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  /** money-typed column: exact cents. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small rate (discount/tax 0.00-0.99). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  val one: Column = lit(1).cast(DecimalType(4, 2))

  /** l_extendedprice * (1 - l_discount), exact. */
  def rev(ep: Column, disc: Column): Column = money(ep) * (one - rate(disc))

  def dbl(c: Column): Column = c.cast(DoubleType)

  // DuckDB-side oracle fragments (same exact-decimal scheme)
  val oRev =
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
  def oMoneySum(col: String) = s"SUM(CAST($col AS DECIMAL(12,2)))"
}
