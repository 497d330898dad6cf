package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Q.t

/** Round-15: row-level DML in the Iceberg change feed. The r14 feed
  * diffed only the live DATA-file sets per snapshot, so a position- or
  * equality-delete commit (UPDATE / DELETE) left its data files live
  * and shipped an EMPTY delete window — a DELETE was invisible to a
  * downstream replica and an UPDATE duplicated rows on a keyless one.
  * [[graft.ops.IcebergLite.readChangesCdc]] now also diffs the
  * DELETE-file sets: delete files added by a snapshot mask its
  * predecessor's live rows (position deletes by (file, pos) semi-join,
  * equality deletes by key semi-join), and the masked rows ride as
  * `_CHANGE_TYPE='delete'` — the Delta feed's DV-growth discipline
  * (DeltaLite.readChanges) applied to iceberg, closing the quartet's
  * last row-level blind spot. Reference: table streams replay the full
  * binlog delta, deletes included
  * (nereids/rules/rewrite/NormalizeOlapTableStreamScan.java:18-56). */
object Round15Queries {

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

    // ICEBERG FEED ACROSS ROW-LEVEL DML: a KEYLESS positional table —
    // an UPDATE window must ship the pre-image rows as deletes next to
    // the replacement inserts, and a DELETE window must be non-empty
    // (the r14 feed shipped nothing for either). Premises: (a) resume
    // never replays a delivered (key, change) pair; (b) the DELETE
    // windows are non-empty; (c) a replica folded BY ROW (net
    // insert−delete per full row — keyless, so no key to fold on)
    // equals the final table exactly.
    "stream_iceberg_cdf_rowdml" -> ((s, dir) => {
      val (ckpt, out) = fresh("iceberg_cdf_rowdml")
      val n = safeName(dir)
      t(s, dir, "orders").filter(col("o_orderkey") < 8000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r15_ord_rd")
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.rd_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r15_ord_rd")
      val tableDir = new java.io.File(s"${lakeDir(s)}/iceberg/rd_$n")
        .getAbsolutePath
      def runOnce(): Unit = {
        val q = s.readStream.format("graft.streaming.CdfSourceProvider")
          .option("path", tableDir).option("format", "iceberg").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce() // initial snapshot as inserts
      s.sql(s"UPDATE graft_iceberg.rd_$n " +
        "SET o_custkey = o_custkey + 1000000 WHERE o_orderkey % 4 = 1")
      runOnce() // update: delete pre-image, insert replacement
      s.sql(s"DELETE FROM graft_iceberg.rd_$n WHERE o_orderkey % 4 = 2")
      runOnce() // row-level delete: non-empty delete window
      val events = s.read.parquet(out)
      val replayed = events
        .groupBy(col("o_orderkey"), col("o_custkey"), col("_CHANGE_TYPE"))
        .count().filter(col("count") > 1).limit(1).count()
      require(replayed == 0L,
        "offset resume premise: a restarted stream must not replay " +
          "already-delivered change windows")
      require(events.filter(col("_CHANGE_TYPE") === "delete" &&
          col("o_orderkey") % 4 === 2).limit(1).count() == 1,
        "row-DML premise: the DELETE statement's window must ship " +
          "per-row deletes — an empty window means the feed is still " +
          "blind to position-delete commits")
      require(events.filter(col("_CHANGE_TYPE") === "delete" &&
          col("o_orderkey") % 4 === 1).limit(1).count() == 1,
        "row-DML premise: the UPDATE window must ship the pre-image " +
          "rows as deletes next to the replacement inserts")
      // replica premise: fold BY ROW (keyless), compare to the table
      val replica = events
        .groupBy(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .agg(sum(when(col("_CHANGE_TYPE") === "delete", -1)
          .otherwise(1)).as("net"))
        .filter(col("net") === 1)
        .drop("net")
      val table = s.sql(s"SELECT * FROM graft_iceberg.rd_$n")
      require(replica.exceptAll(table).limit(1).count() == 0 &&
        table.exceptAll(replica).limit(1).count() == 0,
        "CDC replica premise: the row-folded replica must equal the " +
          "final table — row-level DML windows are wrong or missing")
      events.groupBy(col("_CHANGE_TYPE"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).cast("bigint").as("sum_ck"))
        .orderBy(col("_CHANGE_TYPE"))
    }),

    // TRANSFORMED-SPEC DML TARGET PRUNING BEYOND ICEBERG: delta stores
    // the TRANSFORMED partition value, so a provable ts-range conjunct
    // on a days(ts) table prunes the UPDATE's and DELETE's target file
    // planning (probe read premise-gated strict subset; the WRITER
    // scan shares the same partFilter — byte-measured in
    // TransformDmlPruneSpec). r14 left non-iceberg DML conservative
    // (planned all files); this closes it.
    "sql_lake_update_prune_tr" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r15_ev_up")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.updp_$n " +
        "PARTITIONED BY (days(ts)) AS SELECT * FROM r15_ev_up")
      def prunedScan(verb: String): Unit = {
        val scan = LakehouseSql.lastScans.headOption.getOrElse(
          sys.error(s"$verb must record its pruned target scan"))
        require(scan.fmt == "delta" &&
          scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
          s"transformed-spec $verb prune premise (delta days(ts)): $scan")
      }
      s.sql(s"UPDATE graft_delta.updp_$n SET event_type = 'bumped' " +
        "WHERE ts >= '2024-01-05 00:00:00' AND ts < '2024-01-07 00:00:00'")
      prunedScan("UPDATE")
      s.sql(s"DELETE FROM graft_delta.updp_$n " +
        "WHERE ts >= '2024-01-20 00:00:00' AND ts < '2024-01-21 00:00:00'")
      prunedScan("DELETE")
      s.sql(s"SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id " +
        s"FROM graft_delta.updp_$n GROUP BY 1 ORDER BY 1")
    }),

    // BUCKET/TRUNCATE WRITE TRANSFORMS ON DELTA (the iceberg-only
    // matrix's second format): `PARTITIONED BY (bucket(8, k))` stamps
    // murmur-bucket partition values on the delta write path and a key
    // equality prunes the file planning; `truncate(100, k)` prunes by
    // range (monotone). DML rides the same stored-value prune — the
    // UPDATE's probe scan is premise-gated a strict subset too.
    "sql_lake_prune_bucket_delta" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "orders").filter(col("o_orderkey") < 1200)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r15_ord_bk")
      val n = safeName(dir)
      def prunedScan(what: String): Unit = {
        val scan = LakehouseSql.lastScans.headOption.getOrElse(
          sys.error(s"$what must record a pruned scan"))
        require(scan.fmt == "delta" &&
          scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
          s"delta transform prune premise ($what): $scan")
      }
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.bkd_$n " +
        "PARTITIONED BY (bucket(8, o_orderkey)) AS SELECT * FROM r15_ord_bk")
      s.sql(s"UPDATE graft_delta.bkd_$n SET o_custkey = o_custkey + 1000000 " +
        "WHERE o_orderkey = 8")
      prunedScan("bucket UPDATE")
      val out1 = s.sql("SELECT 'bucket_upd' AS leg, count(*) AS cnt, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_delta.bkd_$n WHERE o_orderkey = 8")
      out1.collect(): Unit
      prunedScan("bucket read")
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.trd_$n " +
        "PARTITIONED BY (truncate(100, o_orderkey)) " +
        "AS SELECT * FROM r15_ord_bk")
      val out2 = s.sql("SELECT 'truncate_range' AS leg, count(*) AS cnt, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_delta.trd_$n " +
        "WHERE o_orderkey >= 400 AND o_orderkey < 800")
      out2.collect(): Unit
      prunedScan("truncate range read")
      out1.unionByName(out2).orderBy(col("leg"))
    }),

    // BUCKET/TRUNCATE WRITE TRANSFORMS ON HUDI + PAIMON — the transform
    // matrix goes 4/4 single-field: key equality prunes the bucket
    // spec's file planning, a key range prunes the truncate spec's, and
    // the PK upsert routes through the transformed partition (stored
    // values are the shared transformCol strings on every format).
    "sql_lake_prune_bucket_hp" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "orders").filter(col("o_orderkey") < 1200)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r15_ord_hp")
      val n = safeName(dir)
      Seq("hudi", "paimon").map { fmt =>
        def prunedScan(what: String): Unit = {
          val scan = LakehouseSql.lastScans.headOption.getOrElse(
            sys.error(s"$what must record a pruned scan"))
          require(scan.fmt == fmt &&
            scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
            s"$fmt transform prune premise ($what): $scan")
        }
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.bkh_$n " +
          "PRIMARY KEY (o_orderkey) PARTITIONED BY (bucket(8, o_orderkey)) " +
          "AS SELECT * FROM r15_ord_hp")
        // PK upsert THROUGH the bucket spec
        s.sql(s"INSERT INTO graft_$fmt.bkh_$n " +
          "SELECT 8 AS o_orderkey, 99999999 AS o_custkey, 'U' AS o_orderstatus")
        val out1 = s.sql(s"SELECT '$fmt bucket' AS leg, count(*) AS cnt, " +
          "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
          s"FROM graft_$fmt.bkh_$n WHERE o_orderkey = 8")
        out1.collect(): Unit
        prunedScan("bucket key read")
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.trh_$n " +
          "PRIMARY KEY (o_orderkey) " +
          "PARTITIONED BY (truncate(100, o_orderkey)) " +
          "AS SELECT * FROM r15_ord_hp")
        val out2 = s.sql(s"SELECT '$fmt truncate' AS leg, count(*) AS cnt, " +
          "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
          s"FROM graft_$fmt.trh_$n " +
          "WHERE o_orderkey >= 400 AND o_orderkey < 800")
        out2.collect(): Unit
        prunedScan("truncate range read")
        out1.unionByName(out2)
      }.reduce(_ unionByName _).orderBy(col("leg"))
    }),

    // VERSION-SCOPED SCHEMA ON ICEBERG (r15: snapshots carry their
    // schema-id): travel ACROSS a rewrite-tier retype reads the OLD
    // type — the r14 edge failed loudly here. The pre-retype read
    // aggregates under BIGINT, the current read under STRING; both
    // value-exact in one frame.
    "sql_lake_retype_travel" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r15_ord_rtt")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.rtt_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r15_ord_rtt")
      val tableDir = new java.io.File(s"${lakeDir(s)}/iceberg/rtt_$n")
        .getAbsolutePath
      val s0 = graft.ops.IcebergLite.currentSnapshotIdOf(tableDir)
      s.sql(s"ALTER TABLE graft_iceberg.rtt_$n " +
        "ALTER COLUMN o_custkey TYPE STRING")
      val pre = s.sql(s"SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck, " +
        "'bigint' AS leg " +
        s"FROM graft_iceberg.rtt_$n FOR VERSION AS OF $s0 GROUP BY 1")
      require(s.sql(s"SELECT * FROM graft_iceberg.rtt_$n FOR VERSION AS OF $s0")
        .schema("o_custkey").dataType.simpleString == "bigint",
        "version-scoped schema premise: travel across the retype must " +
          "read the snapshot's OWN (integer) type")
      val cur = s.sql(s"SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(CAST(o_custkey AS BIGINT)) AS BIGINT) AS sum_ck, " +
        "'string' AS leg " +
        s"FROM graft_iceberg.rtt_$n GROUP BY 1")
      require(s.sql(s"SELECT * FROM graft_iceberg.rtt_$n")
        .schema("o_custkey").dataType.simpleString == "string",
        "current read premise: the retype landed")
      pre.unionByName(cur).orderBy(col("leg"), col("o_orderstatus"))
    }),

    // MERGE USING (subquery) AT ANY NESTING DEPTH (r15: balanced-paren
    // extraction; r14 parsed one level): a derived table over a
    // derived table over a lakehouse source, with an IN-subquery below
    // — the inner graft reference rewrites recursively.
    "sql_lake_merge_nested_src" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r15_ord_mn")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.mn_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r15_ord_mn")
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.mns_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r15_ord_mn WHERE o_orderkey % 3 = 0")
      s.sql(s"MERGE INTO graft_delta.mn_$n t USING " +
        "(SELECT o_orderkey, ck FROM " +
        s"(SELECT o_orderkey, o_custkey * 10 AS ck FROM graft_delta.mns_$n " +
        "WHERE o_orderkey IN (SELECT o_orderkey FROM r15_ord_mn " +
        "WHERE o_orderkey % 6 = 0)) inner1) s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET o_custkey = s.ck")
      s.sql(s"SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_delta.mn_$n GROUP BY 1 ORDER BY 1")
    })
  )

  def oracle: Map[String, String] = Map(

    // feed content: inserts = every initial row + the updated rows'
    // replacements (custkey + 1e6); deletes = the updated rows'
    // pre-images + the deleted rows
    "stream_iceberg_cdf_rowdml" -> """
      WITH base AS (
        SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey < 8000)
      SELECT * FROM (
        SELECT 'delete' AS _CHANGE_TYPE, count(*) AS n,
               CAST(sum(o_custkey) AS BIGINT) AS sum_ck
        FROM base WHERE o_orderkey % 4 IN (1, 2)
        UNION ALL
        SELECT 'insert' AS _CHANGE_TYPE, count(*) AS n,
               CAST(sum(ck) AS BIGINT) AS sum_ck
        FROM (SELECT o_custkey AS ck FROM base
              UNION ALL
              SELECT o_custkey + 1000000 AS ck FROM base
              WHERE o_orderkey % 4 = 1))
      ORDER BY _CHANGE_TYPE""",

    // the 2-day window's rows re-type to 'bumped'; the Jan-20 day deletes
    "sql_lake_update_prune_tr" -> """
      SELECT CASE WHEN ts >= TIMESTAMP '2024-01-05 00:00:00'
                   AND ts < TIMESTAMP '2024-01-07 00:00:00'
                  THEN 'bumped' ELSE event_type END AS event_type,
             count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE NOT (ts >= TIMESTAMP '2024-01-20 00:00:00'
                 AND ts < TIMESTAMP '2024-01-21 00:00:00')
      GROUP BY 1 ORDER BY 1""",

    // key 8's custkey carries the +1e6 update; the truncate leg sums
    // an untouched key range
    "sql_lake_prune_bucket_delta" -> """
      SELECT 'bucket_upd' AS leg, count(*) AS cnt,
             CAST(sum(o_custkey + 1000000) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey = 8
      UNION ALL
      SELECT 'truncate_range' AS leg, count(*) AS cnt,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey >= 400 AND o_orderkey < 800
      ORDER BY leg""",

    // key 8's custkey is upserted to 99999999 on both formats; the
    // truncate legs sum an untouched range
    "sql_lake_prune_bucket_hp" -> """
      SELECT fmt || ' bucket' AS leg, count(*) AS cnt,
             CAST(99999999 AS BIGINT) AS sum_ck
      FROM orders
      CROSS JOIN (SELECT unnest(['hudi', 'paimon']) AS fmt) f
      WHERE o_orderkey = 8
      GROUP BY 1
      UNION ALL
      SELECT fmt || ' truncate' AS leg, count(*) AS cnt,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders
      CROSS JOIN (SELECT unnest(['hudi', 'paimon']) AS fmt) f2
      WHERE o_orderkey >= 400 AND o_orderkey < 800
      GROUP BY 1
      ORDER BY leg""",

    // both legs aggregate the same rows; only the read-time type differs
    "sql_lake_retype_travel" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck, leg
      FROM orders
      CROSS JOIN (SELECT unnest(['bigint', 'string']) AS leg) l
      WHERE o_orderkey < 9000
      GROUP BY 1, 4 ORDER BY leg, o_orderstatus""",

    // keys divisible by 6 carry custkey*10 (the nested source is the
    // %3 lakehouse table filtered to %6 by the IN-subquery)
    "sql_lake_merge_nested_src" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             CAST(sum(CASE WHEN o_orderkey % 6 = 0 THEN o_custkey * 10
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey < 9000
      GROUP BY 1 ORDER BY 1"""
  )
}
