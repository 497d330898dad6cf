package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (reference: be/src/exec/operator/join/
  * asof_left_inner_join_impl.cpp:24, probe-side sorted lookup in
  * join/process_hash_table_probe.h:72-75 — Doris ASOF_LEFT_INNER /
  * ASOF_LEFT_OUTER with a <= inequality key).
  *
  * Spark-native rewrite: tag both sides, union, and run
  * last(value, ignoreNulls) over (partition by keys order by
  * (time, side) rows unbounded-preceding..current) — one shuffle on
  * the key columns, no per-row lookups; identical distribution
  * behavior to a shuffle hash join, so it scales like any keyed join.
  */
object AsofJoin {

  /** Backward as-of: for each left row, the right row with equal keys
    * and the greatest rightTime <= leftTime. `payload` = right columns
    * to carry into the result (prefixed r_). inner=true drops
    * unmatched left rows. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   payload: Seq[String], inner: Boolean,
                   toleranceUs: Option[Long] = None): DataFrame = {
    // The whole right payload rides in ONE struct (with an always-true
    // match marker), so a single last(ignoreNulls) carries an entire
    // right row — never a stitch of columns from different right rows
    // when some payload values are NULL, and an all-NULL payload still
    // counts as a match via the marker.
    // side 0 = right (sorts before left at equal ts => <= semantics);
    // the struct itself is the tiebreaker among right rows with equal
    // (keys, ts), making the picked row deterministic.
    // With a tolerance, the matched right row's OWN timestamp rides in
    // the struct (trailing field — appended so the tie-break ordering
    // of the tolerance-free path is unchanged) and the match is NULLed
    // when it is too old. Exact integer microseconds on both sides of
    // the comparison — no float/second truncation at the boundary.
    val payFields = (lit(true).as("__m") +: payload.map(c => col(c).as(c))) ++
      (if (toleranceUs.isDefined) Seq(unix_micros(col(rightTime)).as("__rts")) else Nil)
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__ts")) :+
        struct(payFields: _*).as("__pay"): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__ts", col(leftTime))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__pay"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched0 = l.unionByName(r, allowMissingColumns = true)
      .select(col("*"), last(col("__pay"), ignoreNulls = true).over(w).as("__r"))
      .filter(col("__side") === 1)
    val matched = toleranceUs.fold(matched0) { tol =>
      matched0.withColumn("__r",
        when(col("__r").isNotNull &&
          unix_micros(col(leftTime)) - col("__r.__rts") <= tol, col("__r")))
    }
    val kept = if (inner) matched.filter(col("__r").isNotNull) else matched
    kept.select(
      left.columns.map(col) ++ payload.map(c => col("__r").getField(c).as(s"r_$c")): _*)
  }
}
