package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType

import graft.streaming.TableStream

/** `cdc_stream('name' [, 'mode'])` table-valued function — the query-side
  * spelling of table streams (reference:
  * fe/fe-core/src/main/java/org/apache/doris/nereids/trees/expressions/functions/table/CdcStream.java
  * + NormalizeOlapTableStreamScan.java). A stream created via
  * [[TableStream.create]] becomes addressable from SQL:
  *
  *   SELECT * FROM cdc_stream('my_stream')              -- MIN_DELTA + consume
  *   SELECT * FROM cdc_stream('my_stream', 'snapshot')  -- full state as APPENDs
  *   SELECT * FROM cdc_stream('my_stream', 'peek')      -- MIN_DELTA, no consume
  *
  * Bound at PARSE time (called from [[GraftSqlParser]]): Spark's builtin
  * `ResolveFunctions` fails fast on any TVF it can't find
  * (UNRESOLVABLE_TABLE_VALUED_FUNCTION), so an injected resolution rule
  * is too late — the unresolved TVF node is swapped for the analyzed
  * min-delta/snapshot plan before the analyzer runs. Everything
  * downstream (filters, joins, aggs over the change feed) then optimizes
  * as ordinary relational ops. Offset semantics: the default mode
  * advances the stream offset once per parse of the SQL text — the same
  * one-consume-per-read contract as [[TableStream.read]]; 'peek' is the
  * idempotent spelling.
  */
object CdcStreamTvf {

  private def strArg(e: Any): Option[String] = e match {
    case Literal(v, StringType) if v != null => Some(v.toString)
    case _ => None
  }

  /** Replace every cdc_stream TVF node in a freshly-parsed plan. */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u: UnresolvedTableValuedFunction
        if u.name.map(_.toLowerCase) == Seq("cdc_stream") =>
      val spark = SparkSession.active
      val args = u.functionArgs.flatMap(strArg)
      if (args.size != u.functionArgs.size || args.isEmpty || args.size > 2)
        throw new IllegalArgumentException(
          "cdc_stream expects ('stream_name' [, 'min_delta'|'snapshot'|'peek'])")
      val name = args.head
      val mode = args.drop(1).headOption.getOrElse("min_delta").toLowerCase
      val df = mode match {
        case "min_delta" | "consume" => TableStream.read(spark, name)
        case "snapshot" => TableStream.readSnapshot(spark, name)
        case "peek" => TableStream.peek(spark, name)
        case other => throw new IllegalArgumentException(
          s"cdc_stream: unknown mode '$other' (min_delta|snapshot|peek)")
      }
      df.queryExecution.analyzed
  }
}
