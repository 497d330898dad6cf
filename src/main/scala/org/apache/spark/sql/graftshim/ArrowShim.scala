package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** private[sql] access shim: Dataset.toArrowBatchRdd and
  * ArrowConverters.toDataFrame are sql-package-private; this subpackage
  * grants graft the Arrow IPC serialization path the reference's Arrow
  * Flight result sink uses (no other Spark internals touched).
  */
object ArrowShim {

  def toBatches(df: DataFrame): Array[Array[Byte]] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
      .toArrowBatchRdd.collect()

  def toDataFrame(spark: SparkSession, schemaJson: String,
                  batches: Iterator[Array[Byte]]): DataFrame =
    ArrowConverters.toDataFrame(
      batches, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
