package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arrow result sink (reference: MemoryScratchSinkOperatorX —
  * memory_scratch_sink_operator.h:53 feeds the Arrow Flight result
  * path). Spark-side equivalent: serialize the result as Arrow IPC
  * record batches (one byte[] per batch, schema travels as JSON) and
  * rehydrate with ArrowConverters.toDataFrame. No Flight endpoint —
  * the transport is the caller's concern (documented); the columnar
  * wire format is the real contract and it round-trips losslessly.
  *
  * At scale: toArrowBatchRdd serializes per-partition on executors —
  * the driver only sees batches the caller collects; a streaming
  * consumer can pull partition-at-a-time via toLocalIterator.
  */
object ArrowResult {

  /** df -> (schemaJson, arrow IPC batches). */
  def serialize(df: DataFrame): (String, Array[Array[Byte]]) =
    (df.schema.json, org.apache.spark.sql.graftshim.ArrowShim.toBatches(df))

  /** (schemaJson, batches) -> DataFrame. */
  def deserialize(spark: SparkSession, schemaJson: String,
                  batches: Array[Array[Byte]]): DataFrame =
    org.apache.spark.sql.graftshim.ArrowShim.toDataFrame(
      spark, schemaJson, batches.iterator)
}
