package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame

/** private[sql] access shim for the V1 streaming Source contract:
  * MicroBatchExecution asserts that a source's getBatch frame has
  * isStreaming = true, and the only way to stamp that on an
  * arbitrary logical plan is SparkSession.internalCreateDataFrame —
  * exactly what Spark's own V1 sources (KafkaSource, FileStreamSource)
  * call. No other internals touched. */
object StreamShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema,
      isStreaming = true)
  }
}
