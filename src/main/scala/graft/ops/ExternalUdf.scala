package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Process-boundary external UDFs (reference: function_rpc.cpp — Doris
  * evaluates a UDF by streaming row batches to an external process
  * over gRPC; function_python_udf.cpp does the same over a local
  * interpreter pipe).
  *
  * The Spark-native mechanism for exactly this contract is RDD.pipe:
  * each partition streams its rows to ONE instance of the external
  * command over stdin and reads transformed rows from stdout — the
  * same batched process-boundary dataflow, with the executor fanning
  * out one subprocess per partition instead of one RPC channel per
  * fragment. This is the sanctioned RDD escape hatch (per-partition
  * imperative logic that genuinely cannot be a Catalyst expression:
  * the computation lives in another process).
  *
  * Protocol: one row per line, fields tab-separated. The value field
  * MUST be tab/newline-free — [[tsvSafe]] enforces it per row (a task
  * failure, never silent frame corruption). For arbitrary corpus text,
  * frame the field yourself with `base64(col)` on the way in and
  * decode in the command / `unbase64` on the way out; a production
  * build would frame with length prefixes like the reference's
  * protobuf envelope.
  *
  * Scale anatomy: no shuffle — the pipe is a map-side transform; at
  * 1000 executors each partition holds its own subprocess, and
  * throughput scales with partition count. Failure of the command
  * fails the task (and Spark retries it), matching RPC-UDF semantics.
  */
object ExternalUdf {

  /** Enforce the line-protocol framing constraint: a value containing
    * tab/newline/CR would silently merge or split frames (one corrupted
    * group instead of one loud error). Codegen CASE WHEN + raise_error,
    * zero cost on clean data. Callers with arbitrary text should
    * base64-frame instead (see object scaladoc). */
  def tsvSafe(c: Column, what: String): Column =
    when(c.rlike("[\\t\\n\\r]"),
      raise_error(concat(
        lit(s"$what: value contains tab/newline/CR — the id\\tvalue line " +
          "protocol would corrupt frames; base64-encode the field " +
          "(base64()/unbase64()) or strip control characters. Offending " +
          "prefix: "),
        substring(c, 1, 40))))
      .otherwise(c)

  /** External-process AGGREGATION (the RPC-UDAF half of the contract:
    * reference function_rpc.cpp's update/merge driven from BE — here
    * the external command owns the whole group because the engine
    * guarantees group locality first). One hash shuffle on the key +
    * a partition-local sort puts every group's rows CONSECUTIVELY in
    * exactly one partition's stdin stream, so the command aggregates
    * on key change with O(1) state — no cross-process merge step
    * needed, which is what makes an opaque-state external aggregator
    * safe at 1000 executors. Output: one `key \t out1 \t out2 ...`
    * line per group, parsed to BIGINT columns. */
  def pipeAggregate(df: DataFrame, keyCol: String, valCol: String,
                    cmd: Seq[String], outCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines: Dataset[String] = df
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .select(concat_ws("\t", col(keyCol).cast("string"),
        tsvSafe(col(valCol).cast("string"), "pipeAggregate")).as("l"))
      .as[String]
    val piped = lines.rdd.pipe(cmd)
    val parsed = split(col("value"), "\t")
    spark.createDataset(piped).select(
      parsed.getItem(0).cast("long").as(keyCol) +:
        outCols.zipWithIndex.map { case (c, i) =>
          parsed.getItem(i + 1).cast("long").as(c)
        }: _*)
  }

  /** Pipe `keyCol \t valCol` lines through `cmd`, returning
    * (keyCol: long, outCol: string) parsed from the command's stdout. */
  def pipeTransform(df: DataFrame, keyCol: String, valCol: String,
                    cmd: Seq[String], outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines: Dataset[String] = df
      .select(concat_ws("\t", col(keyCol).cast("string"),
        tsvSafe(col(valCol), "pipeTransform")).as("l"))
      .as[String]
    val piped = lines.rdd.pipe(cmd)
    spark.createDataset(piped)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as(keyCol),
        split(col("value"), "\t").getItem(1).as(outCol))
  }
}
