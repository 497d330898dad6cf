package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-16: the Hudi incremental feed rides its own maintenance/DDL.
  * The r15 feed refused any window covering a `replaces:true` instant,
  * making hudi the only format whose consumer had to re-seed across a
  * retype or TRUNCATE. [[graft.ops.HudiLite.readIncrementalMor]] now
  * applies the iceberg discipline (IcebergLite.readChangesCdc's
  * removed-file handling): a retype replacecommit is feed-QUIET (state
  * motion), TRUNCATE TABLE/PARTITION ships the then-live rows of the
  * dropped scope as `_CHANGE_TYPE='delete'`, and INSERT OVERWRITE
  * ships predecessor deletes next to its fresh inserts — every frame
  * schema-resolved AS OF its own instant and aligned to the current
  * declared types. Reference: table streams replay the full binlog
  * delta across maintenance and DDL
  * (nereids/rules/rewrite/NormalizeOlapTableStreamScan.java:18-56). */
object Round16Queries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  private def lakeDir(s: SparkSession): String =
    s.conf.getOption("spark.graft.lakehouse.dir").getOrElse("target/lakehouse")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // HUDI FEED ACROSS REPLACE INSTANTS. Premises: (a) the TRUNCATE
    // PARTITION window ships exactly the dropped partition's then-live
    // rows as deletes; (b) the OVERWRITE window ships predecessor
    // deletes + fresh inserts; (c) a replica folded BY KEY window-by-
    // window (deletes drop, upserts/inserts replace) equals the final
    // table exactly; (d) a window covering only the retype instant is
    // EMPTY (state motion) and the post-retype snapshot carries the
    // new type.
    "stream_hudi_cdf_replace" -> ((s, dir) => {
      import graft.ops.HudiLite
      val n = safeName(dir)
      val tableDir = new java.io.File(s"${lakeDir(s)}/hudi/cdfrep_$n")
        .getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val base = t(s, dir, "orders").filter(col("o_orderkey") < 4000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_custkey"))
      HudiLite.createTable(s, tableDir, base,
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus",
        instant = "001")
      // in-place upserts (partition value unchanged)
      HudiLite.upsert(s, tableDir,
        base.filter(col("o_orderkey") % 5 === 1)
          .withColumn("o_custkey", col("o_custkey") + 1000000L),
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus",
        instant = "002")
      HudiLite.truncatePartition(tableDir, "F", "003")
      HudiLite.overwriteTable(s, tableDir,
        base.filter(col("o_orderkey") % 3 === 0)
          .withColumn("o_custkey", col("o_custkey") + 7L),
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus",
        instant = "004")
      val keys = Seq("o_orderkey")
      val windows = Seq(("000", "001"), ("001", "002"), ("002", "003"),
        ("003", "004")).map { case (f0, t0) =>
        HudiLite.readIncrementalMor(s, tableDir, f0, t0, keys)
      }
      require(windows(2).filter(col("_CHANGE_TYPE") === "delete")
          .limit(1).count() == 1,
        "replace premise: the TRUNCATE PARTITION window must ship the " +
          "dropped partition's then-live rows as deletes")
      require(windows(3).filter(col("_CHANGE_TYPE") === "delete")
          .limit(1).count() == 1 &&
          windows(3).filter(col("_CHANGE_TYPE") === "insert")
            .limit(1).count() == 1,
        "replace premise: the OVERWRITE window must ship predecessor " +
          "deletes next to its fresh inserts")
      // replica: fold each window by key — deletes drop, changes replace
      val replica = windows.foldLeft(base.limit(0)) { (acc, w) =>
        val dels = w.filter(col("_CHANGE_TYPE") === "delete")
          .select("o_orderkey")
        val ups = w.filter(col("_CHANGE_TYPE") =!= "delete")
          .drop("_CHANGE_TYPE")
        acc.join(dels, Seq("o_orderkey"), "left_anti")
          .join(ups.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
          .unionByName(ups)
      }
      val table = HudiLite.readSnapshotMor(s, tableDir, keys)
      require(replica.exceptAll(table).limit(1).count() == 0 &&
          table.exceptAll(replica).limit(1).count() == 0,
        "replica premise: the key-folded feed must equal the final " +
          "table across TRUNCATE PARTITION and OVERWRITE instants")
      // retype is feed-QUIET: its window is empty, the snapshot retypes
      HudiLite.retypeColumn(s, tableDir, "o_custkey", "string",
        keyCols = keys, partCol = "o_orderstatus", instant = "005")
      val w5 = HudiLite.readIncrementalMor(s, tableDir, "004", "005", keys)
      require(w5.limit(1).count() == 0,
        "replace premise: a retype replacecommit is state motion — its " +
          "window must be empty")
      require(HudiLite.readSnapshotMor(s, tableDir, keys)
          .schema("o_custkey").dataType ==
          org.apache.spark.sql.types.StringType,
        "retype premise: the post-retype snapshot carries the new type")
      windows.reduce(_ unionByName _)
        .groupBy(col("_CHANGE_TYPE"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_custkey")).cast("bigint").as("sum_ck"))
        .orderBy(col("_CHANGE_TYPE"))
    }),

    // MULTI-FIELD PARTITION SPEC ON DELTA — the sibling of
    // `sql_lake_update_multispec` (iceberg): every add action stamps
    // the full component map in partitionValues, so a provable
    // conjunct on ANY spec field prunes reads and DML target planning.
    // Premises: the bucket-component UPDATE and the day-range DELETE
    // each plan a STRICT file subset, and a day-equality SELECT prunes
    // its read — at 100 TB a key-scoped statement must not open every
    // partition's files. INSERT re-lands under the same spec (the
    // appended day joins the pruned read).
    "sql_lake_multispec_delta" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r16_ev_md")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.md_$n " +
        "PARTITIONED BY (days(ts), bucket(8, event_id)) " +
        "AS SELECT * FROM r16_ev_md")
      // append-after-create exercises appendMultiSpec on a live table
      s.sql(s"INSERT INTO graft_delta.md_$n " +
        "SELECT event_id + 100000 AS event_id, ts, 'XTRA' AS event_type, " +
        "value FROM r16_ev_md WHERE event_id % 50 = 0")
      s.sql(s"UPDATE graft_delta.md_$n SET event_type = 'UPD' " +
        "WHERE event_id = 77")
      val uScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: UPDATE must record a pruned scan"))
      require(uScan.plannedFiles >= 1 && uScan.plannedFiles * 2 <= uScan.totalFiles,
        s"premise: bucket-component UPDATE must plan a strict subset, got $uScan")
      s.sql(s"DELETE FROM graft_delta.md_$n " +
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-08 00:00:00'")
      val dScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: DELETE must record a pruned scan"))
      require(dScan.plannedFiles >= 1 && dScan.plannedFiles * 2 <= dScan.totalFiles,
        s"premise: day-component DELETE must plan a strict subset, got $dScan")
      val probe = s.sql(s"SELECT count(*) AS c FROM graft_delta.md_$n " +
        "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-11 00:00:00'")
      probe.collect(): Unit
      val rScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: the SELECT must record a pruned scan"))
      require(rScan.plannedFiles >= 1 && rScan.plannedFiles * 2 <= rScan.totalFiles,
        s"premise: day-equality SELECT must plan a strict subset, got $rScan")
      s.sql(s"SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id " +
        s"FROM graft_delta.md_$n GROUP BY 1 ORDER BY 1")
    }),

    // MULTI-FIELD PARTITION SPEC ON PAIMON (append-only): the manifest
    // stores the joined component tuple, so a provable conjunct on ANY
    // spec field prunes the file planning. Premises: a day-range
    // SELECT and a bucket-equality SELECT each plan a STRICT file
    // subset; the INSERT re-lands under the spec (its rows join the
    // pruned reads).
    "sql_lake_multispec_paimon" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r16_ev_mp")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.mp2_$n " +
        "PARTITIONED BY (days(ts), bucket(8, event_id)) " +
        "AS SELECT * FROM r16_ev_mp")
      s.sql(s"INSERT INTO graft_paimon.mp2_$n " +
        "SELECT event_id + 100000 AS event_id, ts, 'XTRA' AS event_type, " +
        "value FROM r16_ev_mp WHERE event_id % 50 = 0")
      val dayProbe = s.sql(s"SELECT count(*) AS c FROM graft_paimon.mp2_$n " +
        "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-11 00:00:00'")
      dayProbe.collect(): Unit
      val dScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: the day SELECT must record a pruned scan"))
      require(dScan.plannedFiles >= 1 && dScan.plannedFiles * 2 <= dScan.totalFiles,
        s"premise: day-component SELECT must plan a strict subset, got $dScan")
      val keyProbe = s.sql(s"SELECT count(*) AS c FROM graft_paimon.mp2_$n " +
        "WHERE event_id = 77")
      keyProbe.collect(): Unit
      val kScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: the key SELECT must record a pruned scan"))
      require(kScan.plannedFiles >= 1 && kScan.plannedFiles * 2 <= kScan.totalFiles,
        s"premise: bucket-component SELECT must plan a strict subset, got $kScan")
      s.sql(s"SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id " +
        s"FROM graft_paimon.mp2_$n GROUP BY 1 ORDER BY 1")
    }),

    // DIGIT-PRESERVING DECIMAL RE-SCALE ×4 — the r15 "known remaining"
    // edge: DECIMAL(12,2) → DECIMAL(16,4) (scale grows, integer-digit
    // capacity kept, so the cast is total) through each format's
    // rewrite tier. hudi/paimon carry PRE-retype narrow decimals in
    // MoR log blocks / LSM files (the upsert wave), the rewrite folds
    // them, and POST-retype upserts log 4-dp decimals (the log codec's
    // exact-string decimal encoding). Premise: the retyped read
    // declares DECIMAL(16,4) on every format.
    "sql_lake_retype_decimal" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(12,2)").as("price"))
        .createOrReplaceTempView("r16_ord_rd")
      val n = safeName(dir)
      Seq("delta", "hudi", "iceberg", "paimon").map { fmt =>
        val pk = fmt match {
          case "hudi" => "PRIMARY KEY (o_orderkey) "
          case "paimon" => "PRIMARY KEY (o_orderstatus, o_orderkey) "
          case _ => ""
        }
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.rd_$n $pk" +
          "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r16_ord_rd")
        if (fmt == "hudi" || fmt == "paimon")
          // narrow (12,2) decimals land in MoR log blocks / LSM files
          s.sql(s"INSERT INTO graft_$fmt.rd_$n " +
            "SELECT o_orderkey, o_orderstatus, " +
            "CAST(price + 100000 AS DECIMAL(12,2)) AS price " +
            "FROM r16_ord_rd WHERE o_orderkey % 10 = 0")
        s.sql(s"ALTER TABLE graft_$fmt.rd_$n " +
          "ALTER COLUMN price TYPE DECIMAL(16,4)")
        val dt = s.sql(s"SELECT * FROM graft_$fmt.rd_$n").schema("price")
          .dataType.simpleString
        require(dt == "decimal(16,4)",
          s"retyped read premise: $fmt reads $dt, want decimal(16,4)")
        // post-retype rows carry 4-dp values (hudi: a decimal log block)
        s.sql(s"INSERT INTO graft_$fmt.rd_$n " +
          "SELECT id AS o_orderkey, 'O' AS o_orderstatus, " +
          "CAST(id + 0.1234 AS DECIMAL(16,4)) AS price " +
          "FROM range(90001, 90011)")
        // DECIMAL rendered to STRING: the only decimal rendering both
        // engines' pandas loaders agree on (raw DECIMAL(38,4) loads as
        // object(Decimal) via pyarrow vs float64 via duckdb and fails
        // the driver's dtype-sensitive hash — the x3_map_agg lesson)
        s.sql(s"SELECT '$fmt' AS fmt, o_orderstatus, count(*) AS cnt, " +
          "CAST(CAST(sum(price) AS DECIMAL(38,4)) AS STRING) AS sum_price " +
          s"FROM graft_$fmt.rd_$n GROUP BY 1, 2")
      }.reduce(_ unionByName _).orderBy(col("fmt"), col("o_orderstatus"))
    })
  )

  def oracle: Map[String, String] = Map(

    // inserts = initial rows + overwrite rows; upserts = the bumped
    // rows; deletes = every then-live row at its replace instant
    // (truncated 'F' rows + the overwrite's whole predecessor), i.e.
    // all post-upsert rows exactly once
    "stream_hudi_cdf_replace" -> """
      WITH base AS (
        SELECT o_orderkey AS k, o_orderstatus AS st, o_custkey AS ck
        FROM orders WHERE o_orderkey < 4000),
      bumped AS (
        SELECT k, st,
               CASE WHEN k % 5 = 1 THEN ck + 1000000 ELSE ck END AS ck
        FROM base)
      SELECT * FROM (
        SELECT 'delete' AS _CHANGE_TYPE, count(*) AS n,
               CAST(sum(ck) AS BIGINT) AS sum_ck FROM bumped
        UNION ALL
        SELECT 'insert' AS _CHANGE_TYPE, count(*) AS n,
               CAST(sum(ck) AS BIGINT) AS sum_ck
        FROM (SELECT ck FROM base
              UNION ALL
              SELECT ck + 7 AS ck FROM base WHERE k % 3 = 0)
        UNION ALL
        SELECT 'upsert' AS _CHANGE_TYPE, count(*) AS n,
               CAST(sum(ck) AS BIGINT) AS sum_ck
        FROM bumped WHERE k % 5 = 1)
      ORDER BY _CHANGE_TYPE""",

    // base events plus the %50=0 'XTRA' copies; event_id=77 re-typed
    // 'UPD'; the Jan 5-7 day window deleted (XTRA rows ride the same
    // ts, so the window clips them too)
    "sql_lake_multispec_delta" -> """
      SELECT CASE WHEN event_id = 77 THEN 'UPD' ELSE event_type END
               AS event_type,
             count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM (
        SELECT event_id, ts, event_type FROM events
        UNION ALL
        SELECT event_id + 100000 AS event_id, ts, 'XTRA' AS event_type
        FROM events WHERE event_id % 50 = 0)
      WHERE NOT (ts >= TIMESTAMP '2024-01-05 00:00:00'
                 AND ts < TIMESTAMP '2024-01-08 00:00:00')
      GROUP BY 1 ORDER BY 1""",

    // base events plus the appended %50=0 'XTRA' copies (append-only:
    // the insert appends, nothing replaces)
    "sql_lake_multispec_paimon" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM (
        SELECT event_id, event_type FROM events
        UNION ALL
        SELECT event_id + 100000 AS event_id, 'XTRA' AS event_type
        FROM events WHERE event_id % 50 = 0)
      GROUP BY 1 ORDER BY 1""",

    // per format: base rows (hudi/paimon's %10=0 keys upserted
    // +100000 at the OLD scale) plus ten 'O'-status 4-dp rows; sums
    // exact in DECIMAL
    "sql_lake_retype_decimal" -> """
      SELECT fmt, o_orderstatus, count(*) AS cnt,
             CAST(CAST(sum(price) AS DECIMAL(38,4)) AS VARCHAR) AS sum_price
      FROM (
        SELECT fmt, o_orderstatus,
               CASE WHEN fmt IN ('hudi','paimon') AND o_orderkey % 10 = 0
                    THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 100000
                              AS DECIMAL(16,4))
                    ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2))
                              AS DECIMAL(16,4)) END AS price
        FROM orders
        CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f
        WHERE o_orderkey < 9000
        UNION ALL
        SELECT fmt, 'O' AS o_orderstatus,
               CAST(id + 0.1234 AS DECIMAL(16,4)) AS price
        FROM range(90001, 90011) r(id)
        CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f)
      GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
