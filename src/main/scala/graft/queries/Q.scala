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

  /** Run `body` with runtime conf `key` set to `value`, then restore the
    * PRIOR value (or unset if there was none) — a literal "false" restore
    * would clobber a session-level opt-in the user had set. */
  def withFlag[A](s: SparkSession, key: String, value: String = "true")(body: => A): A = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** money-typed column: exact cents. */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))
  /** small rate (discount/tax 0.00-0.99). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))
  val one: Column = lit(1).cast(DecimalType(4, 2))

  /** l_extendedprice * (1 - l_discount), exact. */
  def rev(ep: Column, disc: Column): Column = money(ep) * (one - rate(disc))

  def dbl(c: Column): Column = c.cast(DoubleType)

  // ---- integer-cents hot path ----------------------------------------
  // Summing DECIMAL(12,2) widens the sum buffer to DECIMAL(22,2), which
  // exceeds Spark's compact-long threshold (18 digits) and falls back to
  // per-row java BigDecimal — ~3-5x slower than a codegen long sum. The
  // reference stores DECIMAL as int64/int128 and aggregates integers
  // (be/src/types: decimal as underlying ints); we do the same: exact
  // integer cents in a LONG, one double conversion at the very end.
  // Exactness bound: |sum| must stay < 2^63. Worst-case lineitem money
  // value ~1.1e7 cents -> safe to ~8e11 rows (>100 TB of lineitem);
  // the 1e-4-dollar (x100) and 1e-6-dollar (x10000) products below are
  // safe to ~9e10 and ~9e9 rows respectively — beyond that, switch the
  // affected aggregate back to the decimal path.
  // The fixtures store money as DOUBLE with 2dp values: v*100 rounds to
  // the exact cent (values << 2^53), matching CAST(v AS DECIMAL(12,2)).

  /** exact integer cents of a 2dp money value. */
  def cents(c: Column): Column = round(c * 100).cast(LongType)
  /** exact integer percent points of a 2dp rate (0.07 -> 7). */
  def pct(c: Column): Column = round(c * 100).cast(LongType)
  /** cents of ep*(1-disc): 1e-4-dollar units. */
  def revCents4(ep: Column, disc: Column): Column =
    cents(ep) * (lit(100L) - pct(disc))
  /** render an integer-unit sum as the same DOUBLE the decimal path
    * yields: one exact long->double conversion, one IEEE division —
    * bit-identical to DuckDB's CAST(DECIMAL-sum AS DOUBLE). */
  def unitsToDbl(sumCol: Column, unitsPerDollar: Double): Column =
    dbl(sumCol) / lit(unitsPerDollar)
  /** drop-in for dbl(sum(money(c))). */
  def moneySumDbl(c: Column): Column = unitsToDbl(sum(cents(c)), 100.0)
  /** drop-in for dbl(sum(rev(ep, disc))). */
  def revSumDbl(ep: Column, disc: Column): Column =
    unitsToDbl(sum(revCents4(ep, disc)), 1e4)

  // DuckDB-side oracle fragments (same exact-decimal scheme)
  val oRev =
    "SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))"
  def oMoneySum(col: String) = s"SUM(CAST($col AS DECIMAL(12,2)))"
}
