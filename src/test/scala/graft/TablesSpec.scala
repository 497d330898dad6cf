package graft

import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-contract spec (round-6 lesson: a driver-side fixture
  * regeneration changed events.ts from nanos-long to TIMESTAMP_NTZ and
  * 18 queries crashed individually). Tables.load0 must normalize
  * whatever encoding arrives and then enforce the post-load schema
  * contract — these tests fail FIRST, in one place, on the next drift. */
class TablesSpec extends AnyFunSuite {
  import TestSpark._

  test("events.ts normalizes to TimestampType regardless of fixture vintage") {
    val dt = Tables.load(spark, sf, "events").schema("ts").dataType
    assert(dt == TimestampType, s"got $dt")
  }

  test("every fixture table passes its post-load schema contract") {
    // load0 throws IllegalStateException with the full diff on drift
    Tables.names.foreach(n => Tables.load(spark, sf, n).schema)
  }

  test("streaming events source agrees with the batch normalization") {
    val batch = Tables.load(spark, sf, "events")
    // unix_micros requires TimestampType — the exact call that crashed
    // in round 6; both paths must accept it
    import org.apache.spark.sql.functions._
    assert(batch.select(expr("unix_micros(ts)")).head().getLong(0) > 0L)
  }
}
