package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table streams — CDC over a commit-versioned UNIQUE-key table
  * (reference: CREATE STREAM ON TABLE,
  * fe/fe-core/.../catalog/stream/{OlapTableStream,StreamReadMode}.java;
  * rewrite nereids/rules/rewrite/NormalizeOlapTableStreamScan.java;
  * suites regression-test/suites/table_stream_p0/ — the
  * test_min_delta_stream semantics are replicated here).
  *
  * Model: a table is a directory of commit-versioned parquet dirs
  * (`root/commit=N/`). A snapshot at version v is merge-on-read over
  * commits <= v: the highest-`seqCol` row per key wins, and a winning
  * row with the delete flag set removes the key (the MoW delete-sign
  * contract, TableModels.scala). A stream records the last consumed
  * version; reading it emits the MIN_DELTA between the consumed and
  * current snapshots under `__DORIS_STREAM_CHANGE_TYPE_COL__`:
  *
  *   - key only in the new snapshot             -> APPEND (new row)
  *   - key only in the old snapshot             -> DELETE (old row —
  *     the pre-window image, exactly the test_mow_min_delta_
  *     delete_before contract: intra-window INSERT/UPDATE churn folds
  *     away and the emitted DELETE carries the pre-delete snapshot)
  *   - key in both with a changed payload       -> UPDATE_BEFORE (old)
  *                                                + UPDATE_AFTER (new)
  *   - key in both, payload identical           -> nothing (min delta)
  *
  * StreamReadMode.SNAPSHOT reads the full current snapshot as APPENDs
  * (`show_initial_rows`); RESET advances the offset to the current
  * version without emitting.
  *
  * 100 TB shape: snapshots are one window (row_number per key) over
  * the commit range = one key shuffle each; the diff is one full-outer
  * key join. No driver-side data movement; commit listing is metadata.
  */
object TableStream {

  val ChangeTypeCol = "__DORIS_STREAM_CHANGE_TYPE_COL__"

  case class StreamDef(name: String, root: String, keys: Seq[String],
                       seqCol: String, delCol: String,
                       var consumedVersion: Long)

  private val registry = new TrieMap[String, StreamDef]()

  /** Append a commit dir (the INSERT transaction analog). */
  def commit(df: DataFrame, root: String, version: Long): Unit =
    df.write.mode("overwrite").parquet(s"$root/commit=$version")

  def currentVersion(spark: SparkSession, root: String): Long = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName).filter(_.startsWith("commit="))
      .map(_.stripPrefix("commit=").toLong)
      .foldLeft(0L)(math.max)
  }

  /** Merge-on-read snapshot at `v` (0 = empty). */
  def snapshotAt(spark: SparkSession, d: StreamDef, v: Long): DataFrame = {
    val all = spark.read.parquet(d.root)
      .filter(col("commit") <= v)
    val w = Window.partitionBy(d.keys.map(col): _*)
      .orderBy(col(d.seqCol).desc, col("commit").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(d.delCol) === 0)
      .drop("__rn", "commit")
  }

  /** MIN_DELTA between two snapshots, tagged with the change-type
    * column. Payload = every column except keys/seq/delete-flag. */
  def minDelta(spark: SparkSession, d: StreamDef,
               fromV: Long, toV: Long): DataFrame = {
    val oldS = snapshotAt(spark, d, fromV)
    val newS = snapshotAt(spark, d, toV)
    val payload = oldS.columns.toSeq
      .filterNot(c => d.keys.contains(c) || c == d.seqCol || c == d.delCol)
    val o = oldS.select(
      d.keys.map(col) ++ payload.map(c => col(c).as(s"__o_$c")) :+ lit(1).as("__in_old"): _*)
    val n = newS.select(
      d.keys.map(col) ++ payload.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__in_new"): _*)
    val joined = o.join(n, d.keys, "full_outer")
    val changed = payload
      .map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def img(side: String, tpe: String) =
      d.keys.map(col) ++ payload.map(c => col(s"__${side}_$c").as(c)) :+
        lit(tpe).as(ChangeTypeCol)
    val appends = joined.filter(col("__in_old").isNull && col("__in_new") === 1)
      .select(img("n", "APPEND"): _*)
    val deletes = joined.filter(col("__in_old") === 1 && col("__in_new").isNull)
      .select(img("o", "DELETE"): _*)
    val updBefore = joined
      .filter(col("__in_old") === 1 && col("__in_new") === 1 && changed)
      .select(img("o", "UPDATE_BEFORE"): _*)
    val updAfter = joined
      .filter(col("__in_old") === 1 && col("__in_new") === 1 && changed)
      .select(img("n", "UPDATE_AFTER"): _*)
    appends.unionAll(deletes).unionAll(updBefore).unionAll(updAfter)
  }

  /** CREATE STREAM ON TABLE: show_initial_rows=false starts at the
    * current version (history not emitted), =true starts at 0. */
  def create(spark: SparkSession, name: String, root: String,
             keys: Seq[String], seqCol: String, delCol: String,
             showInitialRows: Boolean = false): StreamDef = {
    val start = if (showInitialRows) 0L else currentVersion(spark, root)
    val d = StreamDef(name, root, keys, seqCol, delCol, start)
    registry.put(name, d)
    d
  }

  /** Consume: emit the min-delta since the last consumption and
    * advance the offset (the partitionOffset commit in
    * OlapTableStream). */
  def read(spark: SparkSession, name: String): DataFrame = {
    val d = registry(name)
    val cur = currentVersion(spark, d.root)
    val out = minDelta(spark, d, d.consumedVersion, cur)
    d.consumedVersion = cur
    out
  }

  /** Like [[read]] but does NOT advance the offset — the idempotent
    * spelling for contexts that may re-evaluate (cdc_stream TVF 'peek'). */
  def peek(spark: SparkSession, name: String): DataFrame = {
    val d = registry(name)
    minDelta(spark, d, d.consumedVersion, currentVersion(spark, d.root))
  }

  /** StreamReadMode.SNAPSHOT: full current state as APPENDs. */
  def readSnapshot(spark: SparkSession, name: String): DataFrame = {
    val d = registry(name)
    snapshotAt(spark, d, currentVersion(spark, d.root))
      .withColumn(ChangeTypeCol, lit("APPEND"))
  }

  /** StreamReadMode.RESET: skip history, emit nothing. */
  def reset(spark: SparkSession, name: String): Unit = {
    val d = registry(name)
    d.consumedVersion = currentVersion(spark, d.root)
  }
}
