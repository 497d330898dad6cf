package graft.ops

import org.apache.spark.sql.types._

/** Sanctioned type-widening promotions for `ALTER COLUMN ... TYPE`
  * (Iceberg spec "Schema Evolution" allows int→long and float→double;
  * the byte/short rungs ride the same INT32 physical encoding). The
  * whole point of the sanction list: every promotion here is one
  * Spark 4's parquet readers up-cast NATIVELY at scan, so widening is
  * metadata-only — no data movement, the reference's light schema
  * change (fe/fe-core/.../alter/SchemaChangeHandler.java, the
  * LIGHT_SCHEMA_CHANGE path vs. the rewrite tier). Narrowing or
  * cross-family changes would need a full rewrite and refuse loudly. */
object TypeWiden {

  def ok(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (FloatType, DoubleType) => true
    // spec: decimal precision may grow, the scale never moves (a scale
    // change rewrites values; a precision change only widens storage)
    case (d1: DecimalType, d2: DecimalType) =>
      d1.scale == d2.scale && d2.precision > d1.precision
    case _ => false
  }

  def check(col: String, from: DataType, to: DataType): Unit =
    require(ok(from, to),
      s"cannot widen $col from ${from.simpleString} to ${to.simpleString} — " +
        "sanctioned promotions: byte/short/int -> bigint, " +
        "byte/short/int -> double, float -> double, " +
        "decimal(p,s) -> decimal(p'>p, s)")

  /** Sanctioned VALUE-REWRITING changes — the reference's rewrite-tier
    * schema change (SchemaChangeHandler's non-LIGHT path): changes
    * every live file must rewrite under, admitted only where the cast
    * is TOTAL (no overflow, no parse failure) so the rewrite cannot
    * lose or null rows:
    *  - integral → string;
    *  - decimal SCALE growth that keeps the integer-digit capacity,
    *    decimal(p,s) → decimal(p',s') with s' ≥ s and p'−s' ≥ p−s
    *    (a bare scale bump like (20,2)→(20,4) shrinks the integer
    *    digits and stays refused). */
  def retypeOk(from: DataType, to: DataType): Boolean = (from, to) match {
    case (ByteType | ShortType | IntegerType | LongType, StringType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      !ok(from, to) && d2.scale >= d1.scale &&
        (d2.precision - d2.scale) >= (d1.precision - d1.scale)
    case _ => false
  }
}
