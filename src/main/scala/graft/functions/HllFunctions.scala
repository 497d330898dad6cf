package graft.functions

import org.apache.datasketches.hll.HllSketch
import org.apache.spark.sql.SparkSession

/** Doris HLL scalar codec surface (reference: be/src/exprs/function/
  * function_hll.cpp — hll_hash / hll_empty build single-value /
  * empty HLL columns that the HLL_UNION agg then merges).
  *
  * Spark's hll_sketch_agg/hll_union/hll_union_agg/hll_cardinality
  * builtins speak the DataSketches HllSketch wire format, so these two
  * scalar constructors (same lgK=12 default) compose with the native
  * functions exactly like Doris's scalar+agg HLL pipeline — sketches
  * built per-row here merge through the builtin union path.
  */
object HllFunctions {

  private val LgK = 12 // Spark's hll_* default lgConfigK

  def register(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("hll_hash", (s: String) => {
      val sk = new HllSketch(LgK)
      if (s != null) sk.update(s)
      sk.toUpdatableByteArray
    })
    u.register("hll_empty", () => new HllSketch(LgK).toUpdatableByteArray)
  }
}
