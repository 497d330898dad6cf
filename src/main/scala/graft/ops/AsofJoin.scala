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
                   payload: Seq[String], inner: Boolean): DataFrame = {
    // side 0 = right (sorts before left at equal ts => <= semantics)
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__ts")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__ts", col(leftTime))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r, allowMissingColumns = true)
      .select(col("*") +:
        payload.map(c => last(col(s"__p_$c"), ignoreNulls = true).over(w).as(s"r_$c")): _*)
      .filter(col("__side") === 1)
    val out = matched.select(
      left.columns.map(col) ++ payload.map(c => col(s"r_$c")): _*)
    if (inner) out.filter(payload.map(c => col(s"r_$c").isNotNull).reduce(_ || _))
    else out
  }
}
