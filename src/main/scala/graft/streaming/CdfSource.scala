package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.{DeltaLite, HudiLite, IcebergLite, PaimonLite}

/** The lakehouse CHANGE FEEDS surfaced as a Structured Streaming
  * SOURCE — `spark.readStream.format("graft-cdf").option("path", dir)
  * .option("format", "delta|iceberg|hudi|paimon").load()` — the glue
  * between the batch incremental-read quartet
  * ([[DeltaLite.readChanges]], [[IcebergLite.readIncremental]],
  * [[HudiLite.readIncrementalMor]], [[PaimonLite.readChangelog]]) and
  * `writeStream`, mirroring the reference's table-stream scan rewrite
  * (fe/fe-core/.../nereids/rules/rewrite/NormalizeOlapTableStreamScan.java).
  *
  * Offsets are the format's native commit coordinate (Delta version /
  * Iceberg snapshot id / Hudi instant / Paimon snapshot id) — all
  * strictly monotone — checkpointed by the engine like any source, so
  * a restarted query RESUMES from the last committed coordinate with
  * no duplicates (the premise `stream_delta_cdf_source` gates). The
  * first batch ships the INITIAL state as `_CHANGE_TYPE='insert'`
  * rows (Delta CDF's startingVersion=0 semantics); later batches ship
  * each window's change rows. Every format emits the same shape:
  * data columns + `_CHANGE_TYPE` (insert/upsert/delete).
  *
  * V1 `Source` by design: its `getBatch(start, end)` returns a whole
  * DataFrame, which lets each format's existing distributed
  * change-read plan (parquet scans, executor-side DV decode, log-block
  * decode) BE the micro-batch — no per-partition reader
  * reimplementation. Driver work per batch is the same metadata walk
  * the batch readers do. */
class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    ("graft-cdf", CdfSource.schemaFor(ctx.sparkSession, parameters))

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new CdfSource(ctx.sparkSession, parameters)
}

object CdfSource {
  private[streaming] def fmtOf(params: Map[String, String]): String = {
    val f = params.getOrElse("format",
      sys.error("graft-cdf needs .option(\"format\", \"delta|iceberg|hudi|paimon\")"))
    require(Set("delta", "iceberg", "hudi", "paimon").contains(f), s"bad format $f")
    f
  }

  private[streaming] def keyColsOf(params: Map[String, String]): Seq[String] =
    params.get("keycols").map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)

  /** data columns + _CHANGE_TYPE, fixed at stream definition. */
  def schemaFor(spark: SparkSession, params: Map[String, String]): StructType = {
    val dir = params("path")
    val data = fmtOf(params) match {
      case "delta" => DeltaLite.readVersion(spark, dir).schema
      case "iceberg" => IcebergLite.readSnapshot(spark, dir).schema
      case "hudi" =>
        HudiLite.readSnapshotMor(spark, dir, keyColsOf(params)).schema
      case "paimon" =>
        StructType(PaimonLite.readChangelog(spark, dir, 0L,
          PaimonLite.latestSnapshotId(dir)).schema.fields
          .filterNot(_.name == "_VALUE_KIND"))
    }
    StructType(data.fields :+
      StructField("_CHANGE_TYPE", StringType, nullable = false))
  }
}

/** The change-window primitives shared by the streaming source and the
  * SQL table-stream route (`CREATE STREAM ... ON TABLE`). */
object CdfFeed {

  /** The format's current commit coordinate (monotone): Delta version /
    * Iceberg snapshot id / Hudi instant / Paimon snapshot id. */
  def coordinate(spark: SparkSession, fmt: String, dir: String): Long = fmt match {
    case "delta" =>
      val logDir = new java.io.File(dir, "_delta_log")
      Option(logDir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("\\d{20}\\.json"))
        .map(_.getName.dropRight(5).toLong).foldLeft(-1L)(math.max)
    case "iceberg" =>
      // a CREATED-EMPTY table has no snapshots yet: coordinate -1
      val r = IcebergLite.snapshotsTable(spark, dir)
        .agg(max(col("snapshot_id"))).head()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    case "hudi" =>
      Option(new java.io.File(dir, ".hoodie").list()).getOrElse(Array.empty)
        .map(_.split('.').head).filter(_.forall(_.isDigit))
        .foldLeft(0L)((m, s) => math.max(m, s.toLong))
    case "paimon" =>
      if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "snapshot", "LATEST"))) 0L
      else PaimonLite.latestSnapshotId(dir)
  }

  /** The change rows of (from, to]; from = None ships the initial
    * state as inserts. Output: data columns + _CHANGE_TYPE. `keyCols`
    * lets the hudi feed fold the predecessor state into delete rows
    * when the window covers a TRUNCATE/OVERWRITE replace instant. */
  def changes(spark: SparkSession, fmt: String, dir: String,
              from: Option[Long], to: Long,
              keyCols: Seq[String] = Nil): DataFrame = fmt match {
    case "delta" =>
      val initial = if (from.isEmpty)
        Some(DeltaLite.readVersion(spark, dir, Some(0L))
          .withColumn("_CHANGE_TYPE", lit("insert")))
      else None
      val fromV = from.getOrElse(0L)
      val windows = if (fromV < to)
        Some(DeltaLite.readChanges(spark, dir, fromV, to)) else None
      (initial.toSeq ++ windows.toSeq).reduce(_ unionByName _)
    case "iceberg" =>
      from match {
        case None =>
          IcebergLite.readSnapshot(spark, dir, Some(to))
            .withColumn("_CHANGE_TYPE", lit("insert"))
        case Some(f) =>
          // per-operation replace handling: appends/upserts ship as
          // inserts, INSERT OVERWRITE / TRUNCATE ship removed rows as
          // deletes + new rows as inserts, rewrite_data_files stays
          // skipped (state motion) — the Delta feed's discipline
          IcebergLite.readChangesCdc(spark, dir, f, to)
      }
    case "hudi" =>
      HudiLite.readIncrementalMor(spark, dir,
        f"${from.getOrElse(0L)}%03d", f"$to%03d", keyCols)
    case "paimon" =>
      // changelog-producer tables stream their persisted changelog
      // (survives compaction); tables WITHOUT a producer (the SQL
      // route's default) feed from the delta files directly — correct
      // until snapshot expiry reclaims them, the trade the producer
      // setting exists to avoid
      val hasProducer = java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "snapshot", "CHANGELOG"))
      val cl =
        if (hasProducer)
          PaimonLite.readChangelog(spark, dir, from.getOrElse(0L), to)
        else PaimonLite.readIncremental(spark, dir, from.getOrElse(0L), to)
      cl.withColumn("_CHANGE_TYPE",
          when(col("_VALUE_KIND") === lit(PaimonLite.KindInsert), lit("insert"))
            .when(col("_VALUE_KIND") === lit(PaimonLite.KindUpdateAfter), lit("upsert"))
            .otherwise(lit("delete")))
        .drop("_VALUE_KIND")
  }
}

class CdfSource(spark: SparkSession, params: Map[String, String]) extends Source {
  private val dir = params("path")
  private val fmt = CdfSource.fmtOf(params)
  private val declared = CdfSource.schemaFor(spark, params)

  override def schema: StructType = declared

  override def getOffset: Option[Offset] =
    Some(LongOffset(CdfFeed.coordinate(spark, fmt, dir)))

  private def coord(o: Offset): Long = o match {
    case LongOffset(v) => v
    case so: SerializedOffset => LongOffset(so).offset
    case other => sys.error(s"unexpected offset $other")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val batch = CdfFeed.changes(spark, fmt, dir, start.map(coord), coord(end),
      CdfSource.keyColsOf(params))
    // exact declared order/set — the engine aliases by position
    StreamShim.asStreaming(
      batch.select(declared.fieldNames.toSeq.map(col): _*))
  }

  override def stop(): Unit = ()
}
