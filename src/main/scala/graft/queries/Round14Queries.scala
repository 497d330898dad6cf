package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Q.t

/** Round-14: per-operation REPLACE handling in the Iceberg change feed.
  * The r13 feed skipped every `replace`-stamped snapshot uniformly —
  * right for `rewrite_data_files` (state motion), wrong for INSERT
  * OVERWRITE and TRUNCATE, which are DATA changes a CDC consumer must
  * see (a replica would silently keep overwritten rows). The writer now
  * stamps the spec's operations (`overwrite` for INSERT OVERWRITE,
  * `delete` for TRUNCATE, `replace` only for rewrites) and
  * [[graft.ops.IcebergLite.readChangesCdc]] diffs each non-replace
  * snapshot's live file set against its predecessor: removed files ship
  * their predecessor-live rows as `_CHANGE_TYPE='delete'`, added files
  * as `'insert'` — the Delta feed's discipline (its dataChange removes
  * already ship overwrites/truncates, `sql_lake_stream_truncate`).
  * Reference: table streams replay the full binlog delta
  * (nereids/rules/rewrite/NormalizeOlapTableStreamScan.java:18-56). */
object Round14Queries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  private def lakeDir(s: SparkSession): String =
    s.conf.getOption("spark.graft.lakehouse.dir").getOrElse("target/lakehouse")

  private def fresh(name: String): (String, String) = {
    val ckpt = s"target/stream/ckpt_$name"
    val out = s"target/stream/out_$name"
    Seq(ckpt, out).foreach { p =>
      val f = new java.io.File(p)
      if (f.exists()) {
        import scala.reflect.io.Directory
        new Directory(f).deleteRecursively()
      }
    }
    (new java.io.File(ckpt).getAbsolutePath, new java.io.File(out).getAbsolutePath)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ICEBERG FEED ACROSS OVERWRITE + TRUNCATE: snapshot-id offsets over
    // three checkpointed runs; the INSERT OVERWRITE window ships the
    // replaced rows as deletes + the new rows as inserts, the TRUNCATE
    // window ships every live row as a delete. Premises: (a) resume
    // never replays a delivered (key, change) pair; (b) a replica FOLDED
    // FROM THE FEED (net insert-delete per row) equals the final table
    // exactly — the CDC contract the r13 skip-all-replace feed broke.
    "stream_iceberg_cdf_replace" -> ((s, dir) => {
      val (ckpt, out) = fresh("iceberg_cdf_replace")
      val n = safeName(dir)
      t(s, dir, "orders").filter(col("o_orderkey") < 8000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_cr")
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.cr_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r14_ord_cr WHERE o_orderkey % 4 = 0")
      val tableDir = new java.io.File(s"${lakeDir(s)}/iceberg/cr_$n")
        .getAbsolutePath
      def runOnce(): Unit = {
        val q = s.readStream.format("graft.streaming.CdfSourceProvider")
          .option("path", tableDir).option("format", "iceberg").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce() // initial snapshot: %4=0 as inserts
      s.sql(s"INSERT OVERWRITE graft_iceberg.cr_$n " +
        "SELECT * FROM r14_ord_cr WHERE o_orderkey % 4 = 1")
      s.sql(s"INSERT INTO graft_iceberg.cr_$n " +
        "SELECT * FROM r14_ord_cr WHERE o_orderkey % 4 = 2")
      runOnce() // overwrite: delete %4=0, insert %4=1; append: insert %4=2
      s.sql(s"TRUNCATE TABLE graft_iceberg.cr_$n")
      s.sql(s"INSERT INTO graft_iceberg.cr_$n " +
        "SELECT * FROM r14_ord_cr WHERE o_orderkey % 4 = 3")
      runOnce() // truncate: delete %4 in (1,2); insert %4=3
      val events = s.read.parquet(out)
      val replayed = events
        .groupBy(col("o_orderkey"), col("_CHANGE_TYPE"))
        .count().filter(col("count") > 1).limit(1).count()
      require(replayed == 0L,
        "offset resume premise: a restarted stream must not replay " +
          "already-delivered change windows")
      // replica premise: fold the feed, compare against the final table
      val replica = events
        .groupBy(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .agg(sum(when(col("_CHANGE_TYPE") === "delete", -1)
          .otherwise(1)).as("net"))
        .filter(col("net") === 1)
        .drop("net")
      val table = s.sql(s"SELECT * FROM graft_iceberg.cr_$n")
      require(replica.exceptAll(table).limit(1).count() == 0 &&
        table.exceptAll(replica).limit(1).count() == 0,
        "CDC replica premise: the feed-folded replica must equal the " +
          "final table — overwrite/truncate windows are being dropped")
      events.groupBy(col("_CHANGE_TYPE"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).cast("bigint").as("sum_ck"))
        .orderBy(col("_CHANGE_TYPE"))
    }),

    // TABLE STREAM × TRUNCATE ON ICEBERG (the delta key's sibling):
    // a SQL stream on a created-empty iceberg table ships the first
    // insert window, and a TRUNCATE window ships every live row as a
    // delete — derived from the snapshot diff of the `delete`-stamped
    // truncate commit, not from log markers (iceberg has none).
    "sql_lake_stream_truncate_iceberg" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_sti")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.sti_$n " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING) " +
        "PARTITIONED BY (o_orderstatus)")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        s"${lakeDir(s)}/_streams/stis_$n.json")): Unit
      s.sql(s"CREATE STREAM graft_stream.stis_$n ON TABLE graft_iceberg.sti_$n")
      require(s.sql(s"SELECT * FROM graft_stream.stis_$n").count() == 0,
        "premise: a stream on a created-empty iceberg table starts empty")
      s.sql(s"INSERT INTO graft_iceberg.sti_$n SELECT * FROM r14_ord_sti")
      val ins = s.sql(s"SELECT count(*) AS n FROM graft_stream.stis_$n " +
        "WHERE _CHANGE_TYPE = 'insert'").head().getLong(0)
      require(ins > 0, "premise: the insert window must ship")
      s.sql(s"TRUNCATE TABLE graft_iceberg.sti_$n")
      // the truncate window: every pre-truncate row rides as a delete
      s.sql(s"SELECT o_orderstatus, _CHANGE_TYPE, count(*) AS n2, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_stream.stis_$n GROUP BY 1, 2 ORDER BY 1, 2")
    }),
  )

  def oracle: Map[String, String] = Map(

    // every %4 class is inserted exactly once; %4 in (0,1,2) rows are
    // deleted once (overwrite replaces the 0s, truncate removes 1s+2s)
    "stream_iceberg_cdf_replace" -> """
      SELECT _CHANGE_TYPE, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM (
        SELECT 'insert' AS _CHANGE_TYPE, o_custkey
        FROM orders WHERE o_orderkey < 8000
        UNION ALL
        SELECT 'delete' AS _CHANGE_TYPE, o_custkey
        FROM orders WHERE o_orderkey < 8000 AND o_orderkey % 4 < 3
      ) u
      GROUP BY 1 ORDER BY 1""",

    // every pre-truncate row rides the delete window
    "sql_lake_stream_truncate_iceberg" -> """
      SELECT o_orderstatus, 'delete' AS _CHANGE_TYPE, count(*) AS n2,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey < 9000
      GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
