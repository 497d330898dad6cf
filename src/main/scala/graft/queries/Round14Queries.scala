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

    // PAIMON LEVELED PARTIAL COMPACTION behind OPTIMIZE: after a full
    // compaction, a small upsert+delete wave leaves L0 debt dwarfed by
    // the compacted tail — the second OPTIMIZE must rewrite only the
    // debt into an INTERMEDIATE level (max-level files carried forward
    // verbatim, premise-gated) while its kept -D tombstones still mask
    // the base rows (value-exact). The 40k synthetic 'Z' partition
    // keeps the debt ratio SF-independent.
    "sql_lake_compact_partial" -> ((s, dir) => {
      import graft.ops.{PaimonLite, PaimonWriter}
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_cp0")
      s.sql(
        """SELECT * FROM r14_ord_cp0
          |UNION ALL
          |SELECT id AS o_orderkey, id AS o_custkey, 'Z' AS o_orderstatus
          |FROM range(100000, 140000)""".stripMargin)
        .createOrReplaceTempView("r14_ord_cp")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.cp_$n " +
        "PRIMARY KEY (o_orderstatus, o_orderkey) " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r14_ord_cp")
      s.sql(s"OPTIMIZE graft_paimon.cp_$n") // full: everything → max level
      val tblDir = new java.io.File(s"${lakeDir(s)}/paimon/cp_$n")
        .getAbsolutePath
      val maxBefore = PaimonLite.planFiles(tblDir)
        .filter(_.level == PaimonWriter.MaxLevel).map(_.path).toSet
      require(maxBefore.nonEmpty, "premise: full compaction landed max-level files")
      // small L0 debt: 20 upserts + 10 deletes on the synthetic keys
      s.sql(s"INSERT INTO graft_paimon.cp_$n " +
        "SELECT id AS o_orderkey, id + 1000000 AS o_custkey, " +
        "'Z' AS o_orderstatus FROM range(100000, 100020)")
      s.sql(s"DELETE FROM graft_paimon.cp_$n WHERE o_orderkey >= 139990")
      s.sql(s"OPTIMIZE graft_paimon.cp_$n")
      val after = PaimonLite.planFiles(tblDir)
      require(after.filter(_.level == PaimonWriter.MaxLevel).map(_.path).toSet
        == maxBefore,
        "premise: partial compaction must carry the max-level tail verbatim")
      val mids = after.filter(f =>
        f.level > 0 && f.level < PaimonWriter.MaxLevel)
      require(mids.nonEmpty,
        "premise: partial compaction must land intermediate-level files")
      def bytes(ps: Iterable[String]): Long =
        ps.map(p => new java.io.File(tblDir, p).length()).sum
      require(bytes(mids.map(_.path)) * 4 < bytes(maxBefore),
        "premise: the partial rewrite must be far below full-bucket bytes")
      s.sql(s"SELECT o_orderstatus, count(*) AS n2, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_paimon.cp_$n GROUP BY 1 ORDER BY 1")
    }),

    // PAIMON DATE PARTITION TRANSFORMS (sql_lake_prune_range's sibling
    // on a second format): `PARTITIONED BY (days(ts))` stores civil-day
    // partition values on write, and a ts range conjunct prunes the
    // FILE planning through the same monotone transform pushdown the
    // iceberg spec branch gets — premise-gated strict subset. The PK
    // leg upserts through the transformed spec; the read is value-exact.
    "sql_lake_prune_range_paimon" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r14_ev_pp")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.prtp_$n " +
        "PRIMARY KEY (ts, event_id) PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM r14_ev_pp")
      // an upsert wave through the transformed spec (same keys,
      // re-typed, integer-exact — no float aggregation in the oracle)
      s.sql(s"INSERT INTO graft_paimon.prtp_$n " +
        "SELECT event_id, ts, 'upserted' AS event_type, value " +
        "FROM r14_ev_pp WHERE event_id % 100 = 0")
      val out = s.sql(
        s"""SELECT event_type, count(*) AS cnt,
           |       CAST(sum(event_id) AS BIGINT) AS sum_id
           |FROM graft_paimon.prtp_$n
           |WHERE ts >= '2024-01-10 00:00:00' AND ts < '2024-01-13 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("range prune premise: the read must record a pruned scan"))
      require(scan.fmt == "paimon" &&
        scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"range prune premise: the ts range must plan a strict file subset " +
          s"of the day partitions, got $scan")
      out
    }),

    // DATE TRANSFORMS ON DELTA + HUDI complete the four-format matrix
    // (paimon's sibling key above): `PARTITIONED BY (days(ts))` stores
    // civil-day partition values on write and a ts range prunes the
    // file planning through the same monotone pushdown. The delta leg
    // appends through the transform after creation; the hudi leg
    // upserts through it (file-group routing keys on the transformed
    // partition value).
    "sql_lake_prune_range_delta_tr" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r14_ev_dt")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.prtd_$n " +
        "PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM r14_ev_dt WHERE event_id % 2 = 0")
      s.sql(s"INSERT INTO graft_delta.prtd_$n " +
        "SELECT * FROM r14_ev_dt WHERE event_id % 2 = 1")
      val out = s.sql(
        s"""SELECT event_type, count(*) AS cnt,
           |       CAST(sum(event_id) AS BIGINT) AS sum_id
           |FROM graft_delta.prtd_$n
           |WHERE ts >= '2024-01-10 00:00:00' AND ts < '2024-01-13 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("range prune premise: the read must record a pruned scan"))
      require(scan.fmt == "delta" &&
        scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"range prune premise (delta days(ts)): got $scan")
      out
    }),

    "sql_lake_prune_range_hudi" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r14_ev_ht")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_hudi.prth_$n " +
        "PRIMARY KEY (event_id) PARTITIONED BY (days(ts)) " +
        "AS SELECT * FROM r14_ev_ht")
      // an upsert wave through the transformed spec (same keys,
      // re-typed — integer-exact oracle)
      s.sql(s"INSERT INTO graft_hudi.prth_$n " +
        "SELECT event_id, ts, 'upserted' AS event_type, value " +
        "FROM r14_ev_ht WHERE event_id % 100 = 0")
      val out = s.sql(
        s"""SELECT event_type, count(*) AS cnt,
           |       CAST(sum(event_id) AS BIGINT) AS sum_id
           |FROM graft_hudi.prth_$n
           |WHERE ts >= '2024-01-10 00:00:00' AND ts < '2024-01-13 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("range prune premise: the read must record a pruned scan"))
      require(scan.fmt == "hudi" &&
        scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"range prune premise (hudi days(ts)): got $scan")
      out
    }),

    // TRUNCATE PARTITION (the reference's specifiedPartition, value-
    // keyed): one metadata-only commit drops a partition's live files —
    // Iceberg rewrites only the touched manifests into a delete-stamped
    // snapshot (surviving entries copy verbatim, stats intact), Delta
    // commits remove tombstones, Paimon one OVERWRITE snapshot of
    // DELETE entries. The partition refills afterwards; hudi refuses
    // loudly (fixed file groups). Premise: no data parquet moves.
    "sql_lake_truncate_partition" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_tp")
      val n = safeName(dir)
      Seq(("iceberg", ""), ("delta", ""),
        ("paimon", "PRIMARY KEY (o_orderstatus, o_orderkey) "),
        // r15: hudi joins via a replacedPartitions commit (the replay
        // drops the partition's file groups; lazy creation refills)
        ("hudi", "PRIMARY KEY (o_orderkey) ")).map {
        case (fmt, pk) =>
          s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.tp_$n $pk" +
            "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r14_ord_tp")
          def dataBytes: Long = {
            def walk(f: java.io.File): Long =
              Option(f.listFiles()).getOrElse(Array.empty).map(c =>
                if (c.isDirectory) walk(c)
                else if (c.getName.endsWith(".parquet")) c.length() else 0L).sum
            walk(new java.io.File(s"${lakeDir(s)}/$fmt/tp_$n"))
          }
          val before = dataBytes
          s.sql(s"TRUNCATE TABLE graft_$fmt.tp_$n " +
            "PARTITION (o_orderstatus = 'F')")
          require(dataBytes == before,
            s"metadata-only premise: $fmt TRUNCATE PARTITION moved data bytes")
          // the partition refills through the normal write path
          s.sql(s"INSERT INTO graft_$fmt.tp_$n " +
            "SELECT o_orderkey, o_custkey, o_orderstatus FROM r14_ord_tp " +
            "WHERE o_orderstatus = 'F' AND o_orderkey % 2 = 0")
          s.sql(s"SELECT '$fmt' AS fmt, o_orderstatus, count(*) AS n2, " +
            "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
            s"FROM graft_$fmt.tp_$n GROUP BY 1, 2")
      }.reduce(_ unionByName _).orderBy(col("fmt"), col("o_orderstatus"))
    }),

    // VALUE-REWRITING SCHEMA CHANGE (the reference's rewrite-tier
    // ALTER, SchemaChangeHandler's non-LIGHT path): `ALTER COLUMN
    // o_custkey TYPE STRING` on a BIGINT column rewrites every live
    // file under the new type in ONE atomic commit per format (delta:
    // metaData + removes + adds in one version; iceberg: new schema
    // entry + replace-all snapshot in one metadata swap) — premise
    // gates pin the one-commit shape and that time travel to the
    // pre-retype version still reads the integer type.
    "sql_lake_retype_column" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_rt")
      val n = safeName(dir)
      // r15: paimon joins the rewrite tier (pending schema + one
      // COMPACT snapshot whose CAS is the single visibility point) and
      // so does hudi (the schema rides IN the one replacecommit)
      Seq("delta", "iceberg", "paimon", "hudi").map { fmt =>
        val pk = fmt match {
          case "paimon" => "PRIMARY KEY (o_orderstatus, o_orderkey) "
          case "hudi" => "PRIMARY KEY (o_orderkey) "
          case _ => ""
        }
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.rt_$n $pk" +
          "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r14_ord_rt")
        def version: Long = fmt match {
          case "delta" => Option(new java.io.File(
              s"${lakeDir(s)}/delta/rt_$n/_delta_log").listFiles())
            .getOrElse(Array.empty)
            .filter(_.getName.endsWith(".json"))
            .map(_.getName.dropRight(5).toLong).max
          case "paimon" => Option(new java.io.File(
              s"${lakeDir(s)}/paimon/rt_$n/snapshot").listFiles())
            .getOrElse(Array.empty)
            .filter(_.getName.startsWith("snapshot-"))
            .map(_.getName.stripPrefix("snapshot-").toLong).max
          case "hudi" => Option(new java.io.File(
              s"${lakeDir(s)}/hudi/rt_$n/.hoodie").listFiles())
            .getOrElse(Array.empty)
            .count(f => f.getName.endsWith(".commit") ||
              f.getName.endsWith(".deltacommit")).toLong
          case _ => Option(new java.io.File(
              s"${lakeDir(s)}/iceberg/rt_$n/metadata").listFiles())
            .getOrElse(Array.empty)
            .filter(_.getName.matches("v\\d+\\.metadata\\.json"))
            .map(_.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong)
            .max
        }
        val v0 = version
        s.sql(s"ALTER TABLE graft_$fmt.rt_$n ALTER COLUMN o_custkey TYPE STRING")
        require(version == v0 + 1,
          s"atomicity premise: a rewrite-retype on $fmt must land exactly " +
            s"ONE commit, got ${version - v0}")
        val dt = s.sql(s"SELECT * FROM graft_$fmt.rt_$n").schema("o_custkey")
          .dataType.simpleString
        require(dt == "string", s"retyped read premise: $fmt reads $dt")
        s.sql(s"SELECT '$fmt' AS fmt, o_orderstatus, count(*) AS cnt, " +
          "min(o_custkey) AS min_ck, max(o_custkey) AS max_ck, " +
          "CAST(sum(CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_ck " +
          s"FROM graft_$fmt.rt_$n GROUP BY 1, 2")
      }.reduce(_ unionByName _).orderBy(col("fmt"), col("o_orderstatus"))
    }),

    // MERGE's full clause grammar (DorisParser.g4 mergeInto: clause
    // kinds interleave, NOT MATCHED actions are `INSERT cols? VALUES
    // row`): two guarded NOT MATCHED clauses claim first-match-wins,
    // the column-subset insert NULL-fills unnamed columns, and the
    // clause order in the statement is interleaved on purpose.
    "sql_lake_merge_values" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r14_ord_mv")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.mv_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r14_ord_mv")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus
          |FROM r14_ord_mv WHERE o_orderkey % 5 = 0
          |UNION ALL
          |SELECT id AS o_orderkey, id AS o_custkey, 'X' AS o_orderstatus
          |FROM range(90001, 90041)""".stripMargin)
        .createOrReplaceTempView("r14_mv_src")
      s.sql(s"MERGE INTO graft_delta.mv_$n t USING r14_mv_src s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN NOT MATCHED AND s.o_orderkey % 2 = 0 THEN " +
        "INSERT (o_orderkey, o_custkey, o_orderstatus) " +
        "VALUES (s.o_orderkey, s.o_custkey * 10, 'E') " +
        "WHEN MATCHED AND s.o_orderkey % 10 = 0 THEN " +
        "UPDATE SET o_custkey = s.o_custkey + 1000000 " +
        "WHEN NOT MATCHED THEN " +
        "INSERT (o_orderkey, o_orderstatus) VALUES (s.o_orderkey, 'O')")
      s.sql(s"SELECT o_orderstatus, count(*) AS cnt, " +
        "count(o_custkey) AS n_ck, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_delta.mv_$n GROUP BY 1 ORDER BY 1")
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

    // range-pruned day partitions; %100==0 keys re-typed by the upsert
    "sql_lake_prune_range_paimon" -> """
      SELECT CASE WHEN event_id % 100 = 0 THEN 'upserted'
                  ELSE event_type END AS event_type,
             count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-13 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    // the 'F' partition truncates then refills with its even keys
    "sql_lake_truncate_partition" -> """
      SELECT fmt, o_orderstatus, count(*) AS n2,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders
      CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f
      WHERE o_orderkey < 9000
        AND (o_orderstatus <> 'F' OR o_orderkey % 2 = 0)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // string min/max are lexicographic on the cast digits — DuckDB's
    // own VARCHAR cast semantics, per format
    "sql_lake_retype_column" -> """
      SELECT fmt, o_orderstatus, count(*) AS cnt,
             min(CAST(o_custkey AS VARCHAR)) AS min_ck,
             max(CAST(o_custkey AS VARCHAR)) AS max_ck,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders
      CROSS JOIN (SELECT unnest(['delta', 'hudi', 'iceberg', 'paimon']) AS fmt) f
      WHERE o_orderkey < 9000
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // the full events range slice (both insert halves union back)
    "sql_lake_prune_range_delta_tr" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-13 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    // %100==0 keys re-typed by the upsert
    "sql_lake_prune_range_hudi" -> """
      SELECT CASE WHEN event_id % 100 = 0 THEN 'upserted'
                  ELSE event_type END AS event_type,
             count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-13 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    // matched %10=0 keys carry +1e6; even new keys insert as ('E',
    // custkey*10), odd new keys as ('O', NULL custkey)
    "sql_lake_merge_values" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             count(o_custkey) AS n_ck,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                    ELSE o_custkey END AS o_custkey
        FROM orders WHERE o_orderkey < 9000
        UNION ALL
        SELECT 'E' AS o_orderstatus, r * 10 AS o_custkey
        FROM range(90002, 90041, 2) t(r)
        UNION ALL
        SELECT 'O' AS o_orderstatus, NULL AS o_custkey
        FROM range(90001, 90041, 2) t2(r)
      ) u
      GROUP BY 1 ORDER BY 1""",

    // the 'Z' partition: 40k synthetic keys, 20 upserted (+1e6 custkey),
    // the last 10 deleted; real partitions untouched
    "sql_lake_compact_partial" -> """
      SELECT o_orderstatus, count(*) AS n2,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM (
        SELECT o_orderkey, o_custkey, o_orderstatus
        FROM orders WHERE o_orderkey < 9000
        UNION ALL
        SELECT r AS o_orderkey,
               CASE WHEN r < 100020 THEN r + 1000000 ELSE r END AS o_custkey,
               'Z' AS o_orderstatus
        FROM range(100000, 139990) t(r)
      ) u
      GROUP BY 1 ORDER BY 1""",
  )
}
