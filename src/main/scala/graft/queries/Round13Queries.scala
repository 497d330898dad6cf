package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import Q.t

/** Round-13: the SQL lakehouse route hardens its DML semantics and
  * widens pruning — zero-match UPDATE/MERGE as standard-SQL no-ops,
  * positional UPDATE/MERGE as ONE atomic commit (position deletes /
  * deletion vectors + the replacement files in a single version —
  * reference shape: be/src/exec/operator/iceberg_merge_sink_operator.h:44
  * commits once), DML target scans pruned by the same provable WHERE
  * conjuncts the read path extracts, single-column OR disjunctions and
  * monotone-transform ranges joining the extractor
  * (fe/fe-core/.../nereids/rules/rewrite/PruneFileScanPartition.java is
  * the FE-role precedent), and the Iceberg/Hudi change feeds gated as
  * streaming sources like their Delta/Paimon siblings. Oracles
  * recompute expected content from the base tables by predicate. */
object Round13Queries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

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

  /** CREATE (orders subset) → RENAME o_custkey TO cust → INSERT
    * post-rename rows carrying `cust` → DROP o_totalprice → aggregate;
    * shared by the four `src_<fmt>_drop_column` keys. Exercises the
    * whole evolution read/write story: pre-rename files serve `cust`
    * through the name mapping, post-rename inserts land under the
    * stable write name, and the dropped column's bytes stay unread. */
  private def dropRenameRoundTrip(s: SparkSession, dir: String,
                                  fmt: String, pk: String): DataFrame = {
    t(s, dir, "orders").filter(col("o_orderkey") < 12000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .createOrReplaceTempView("r13_ord_dr")
    val n = safeName(dir)
    s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.dr_$n $pk " +
      "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13_ord_dr")
    s.sql(s"ALTER TABLE graft_$fmt.dr_$n RENAME COLUMN o_custkey TO cust")
    s.sql(s"INSERT INTO graft_$fmt.dr_$n " +
      "SELECT id AS o_orderkey, id * 3 AS cust, 'O' AS o_orderstatus, " +
      "CAST(0.0 AS DOUBLE) AS o_totalprice FROM range(90001, 90021)")
    s.sql(s"ALTER TABLE graft_$fmt.dr_$n DROP COLUMN o_totalprice")
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS cnt,
         |       CAST(sum(cust) AS BIGINT) AS sum_cust
         |FROM graft_$fmt.dr_$n GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "src_iceberg_drop_column" -> ((s, dir) =>
      dropRenameRoundTrip(s, dir, "iceberg", "")),
    "src_delta_drop_column" -> ((s, dir) =>
      dropRenameRoundTrip(s, dir, "delta", "")),
    "src_hudi_drop_column" -> ((s, dir) =>
      dropRenameRoundTrip(s, dir, "hudi", "PRIMARY KEY (o_orderkey)")),
    "src_paimon_drop_column" -> ((s, dir) =>
      dropRenameRoundTrip(s, dir, "paimon",
        "PRIMARY KEY (o_orderstatus, o_orderkey)")),

    // ZERO-MATCH DML IS A NO-OP (standard SQL): an UPDATE whose WHERE
    // matches nothing — including a partition predicate that prunes to
    // ZERO files — resolves successfully and leaves the table
    // byte-identical. Both engines recompute the unchanged content.
    "sql_lake_update_nomatch" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 8000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r13_li_nm")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.unm_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r13_li_nm")
      // no row has this key; the partition exists
      s.sql(s"UPDATE graft_delta.unm_$n SET l_quantity = 0 " +
        "WHERE l_returnflag = 'A' AND l_orderkey = -1").collect()
      // no partition has this value: the pruned read is EMPTY, the
      // statement still a successful no-op
      s.sql(s"UPDATE graft_delta.unm_$n SET l_quantity = 0 " +
        "WHERE l_returnflag = 'Z'").collect()
      // zero-match MERGE, same contract
      s.sql("SELECT CAST(-7 AS BIGINT) AS l_orderkey, 'A' AS l_returnflag, " +
        "CAST(0 AS DOUBLE) AS l_quantity")
        .createOrReplaceTempView("r13_nm_src")
      s.sql(s"MERGE INTO graft_delta.unm_$n tt USING r13_nm_src ss " +
        "ON tt.l_orderkey = ss.l_orderkey " +
        "WHEN MATCHED THEN UPDATE SET l_quantity = ss.l_quantity").collect()
      s.sql(s"SELECT l_returnflag, count(*) AS cnt, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
        s"FROM graft_delta.unm_$n GROUP BY 1 ORDER BY 1")
    }),

    // SINGLE-COLUMN OR DISJUNCTION PRUNES: `p='A' OR p='N'` is an IN in
    // disguise — the premise gate asserts a strict file subset was
    // planned, and the soundness negative (mixed-column OR must NOT
    // prune) is pinned in SqlPruneSpec.
    "sql_lake_prune_or" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r13_li_or")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.pror_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r13_li_or")
      val out = s.sql(
        s"""SELECT l_returnflag, count(*) AS cnt,
           |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM graft_iceberg.pror_$n
           |WHERE l_returnflag = 'A' OR l_returnflag = 'N'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("OR prune premise: the read must record a pruned scan"))
      require(scan.plannedFiles >= 2 && scan.plannedFiles < scan.totalFiles,
        s"OR prune premise: the disjunction must plan a strict file subset, " +
          s"got $scan")
      out
    }),

    // MONOTONE-TRANSFORM RANGE PRUNING: a day(ts) partition spec prunes
    // under a timestamp RANGE — each bound pushes through the
    // truncation (widened a day for the DST caveat) and the manifest
    // walk plans only the covered days' files.
    "sql_lake_prune_range" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r13_ev")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.prts_$n " +
        "PARTITIONED BY (days(ts)) AS SELECT * FROM r13_ev")
      val out = s.sql(
        s"""SELECT event_type, count(*) AS cnt,
           |       CAST(sum(event_id) AS BIGINT) AS sum_id
           |FROM graft_iceberg.prts_$n
           |WHERE ts >= '2024-01-10 00:00:00' AND ts < '2024-01-13 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("range prune premise: the read must record a pruned scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"range prune premise: the ts range must plan a strict file subset " +
          s"of the month's day partitions, got $scan")
      out
    }),

    // DML TARGET PRUNING: an UPDATE whose WHERE carries a partition
    // conjunct plans ONE partition's files in the writer's target scan
    // (lastScans records the probe read's pruning; the writer receives
    // the same predicate), and the whole statement is one atomic
    // deletion-vector + add commit.
    "sql_lake_update_prune" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r13_li_up")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.updp_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r13_li_up")
      s.sql(s"UPDATE graft_delta.updp_$n SET l_quantity = l_quantity + 500 " +
        "WHERE l_returnflag = 'R' AND l_orderkey % 2 = 0").collect()
      val scan = LakehouseSql.lastScans.find(_.fmt == "delta").getOrElse(
        sys.error("UPDATE prune premise: the statement must record a pruned scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"UPDATE prune premise: WHERE l_returnflag='R' must plan a strict " +
          s"file subset, got $scan")
      s.sql(s"SELECT l_returnflag, count(*) AS cnt, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
        s"FROM graft_delta.updp_$n GROUP BY 1 ORDER BY 1")
    }),

    // PK UPSERT OVER A TRANSFORMED SPEC: a PRIMARY KEY table
    // PARTITIONED BY (bucket(8, k)) takes INSERT-as-upsert commits
    // (equality deletes are unpartitioned; data files stamp the spec);
    // key equality still prunes through the transform.
    "sql_lake_upsert_bucket" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "orders").filter(col("o_orderkey") < 10000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13_ord_ub")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.ub_$n " +
        "PRIMARY KEY (o_orderkey) PARTITIONED BY (bucket(8, o_orderkey)) " +
        "AS SELECT * FROM r13_ord_ub")
      s.sql(s"INSERT INTO graft_iceberg.ub_$n " +
        "SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_orderstatus " +
        "FROM r13_ord_ub WHERE o_orderkey % 7 = 0")
      val out = s.sql(
        s"""SELECT o_orderstatus, count(*) AS cnt,
           |       CAST(sum(o_custkey) AS BIGINT) AS sum_ck
           |FROM graft_iceberg.ub_$n GROUP BY 1 ORDER BY 1""".stripMargin)
      // key equality prunes the bucket spec after the upsert
      s.sql(s"SELECT o_custkey FROM graft_iceberg.ub_$n WHERE o_orderkey = 7")
        .collect(): Unit
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("bucket upsert premise: key equality must record a pruned scan"))
      require(scan.plannedFiles < scan.totalFiles,
        s"bucket upsert premise: key equality must plan a strict subset, got $scan")
      out
    }),

    // MAINTENANCE VERBS THROUGH SQL: OPTIMIZE folds deletion vectors /
    // position deletes into fresh files, VACUUM physically reclaims the
    // superseded bytes (premise: something was actually reclaimed), and
    // the surviving content is value-exact after the full lifecycle.
    "sql_lake_maintenance" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 8000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r13_li_mx")
      val n = safeName(dir)
      for (fmt <- Seq("delta", "iceberg")) {
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.mx_$n " +
          "PARTITIONED BY (l_returnflag) AS SELECT * FROM r13_li_mx")
        s.sql(s"DELETE FROM graft_$fmt.mx_$n WHERE l_orderkey % 3 = 0")
        s.sql(s"OPTIMIZE graft_$fmt.mx_$n")
        // RETAIN N VERSIONS is snapshot-count retention (iceberg/paimon);
        // delta vacuum reclaims by reference
        val retain = if (fmt == "iceberg") " RETAIN 1 VERSIONS" else ""
        val reclaimed = s.sql(s"VACUUM graft_$fmt.mx_$n$retain")
          .head().getLong(0)
        require(reclaimed > 0,
          s"maintenance premise: $fmt VACUUM must reclaim the superseded " +
            s"files, got $reclaimed")
      }
      s.sql(
        s"""SELECT d.l_returnflag, d.cnt, d.sum_qty,
           |       i.cnt AS cnt_iceberg, i.sum_qty AS sum_qty_iceberg
           |FROM (SELECT l_returnflag, count(*) AS cnt,
           |             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |      FROM graft_delta.mx_$n GROUP BY 1) d
           |JOIN (SELECT l_returnflag, count(*) AS cnt,
           |             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |      FROM graft_iceberg.mx_$n GROUP BY 1) i
           |  ON d.l_returnflag = i.l_returnflag
           |ORDER BY d.l_returnflag""".stripMargin)
    }),

    // INSERT OVERWRITE on the LSM/MoR formats, completing the 4/4 verb
    // matrix: paimon commits ONE commitKind=OVERWRITE snapshot (no base
    // manifests), hudi ONE replacecommit instant (the replay supersedes
    // every file group). Both tables then take a normal PK INSERT on
    // top, proving the overwritten state is a live, writable table.
    "sql_lake_overwrite_lsm" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
        .createOrReplaceTempView("r13_ord_ow")
      val n = safeName(dir)
      for (fmt <- Seq("paimon", "hudi")) {
        val pk = if (fmt == "paimon") "PRIMARY KEY (o_orderstatus, o_orderkey)"
          else "PRIMARY KEY (o_orderkey)"
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.ow_$n $pk " +
          "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13_ord_ow")
        s.sql(s"INSERT OVERWRITE graft_$fmt.ow_$n " +
          "SELECT o_orderstatus, o_orderkey, o_custkey + 5000000 AS o_custkey " +
          "FROM r13_ord_ow WHERE o_orderkey % 3 = 0")
        s.sql(s"INSERT INTO graft_$fmt.ow_$n " +
          "SELECT 'O' AS o_orderstatus, id AS o_orderkey, id AS o_custkey " +
          "FROM range(90001, 90011)")
      }
      s.sql(
        s"""SELECT pa.o_orderstatus, pa.n, pa.sum_ck,
           |       hu.n AS n_hudi, hu.sum_ck AS sum_ck_hudi
           |FROM (SELECT o_orderstatus, count(*) AS n,
           |             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
           |      FROM graft_paimon.ow_$n GROUP BY 1) pa
           |JOIN (SELECT o_orderstatus, count(*) AS n,
           |             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
           |      FROM graft_hudi.ow_$n GROUP BY 1) hu
           |  ON pa.o_orderstatus = hu.o_orderstatus
           |ORDER BY pa.o_orderstatus""".stripMargin)
    }),

    // CONDITIONAL MERGE CLAUSES (standard SQL): WHEN MATCHED AND g THEN
    // UPDATE / DELETE + guarded NOT MATCHED INSERT, first-match-wins,
    // unclaimed matches untouched — one atomic DV+add commit on the
    // positional route.
    "sql_lake_merge_cond" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13_ord_mc")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.mc_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13_ord_mc")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus
          |FROM r13_ord_mc WHERE o_orderkey % 5 = 0
          |UNION ALL
          |SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus
          |FROM range(90001, 90041)""".stripMargin)
        .createOrReplaceTempView("r13_mc_src")
      // matched %10=0 keys update (custkey += 1e6), matched %10=5 keys
      // delete, new keys insert only when even
      s.sql(s"MERGE INTO graft_delta.mc_$n t USING r13_mc_src src " +
        "ON t.o_orderkey = src.o_orderkey " +
        "WHEN MATCHED AND src.o_orderkey % 10 = 0 THEN " +
        "UPDATE SET o_custkey = src.o_custkey + 1000000 " +
        "WHEN MATCHED AND src.o_orderkey % 10 = 5 THEN DELETE " +
        "WHEN NOT MATCHED AND src.o_orderkey % 2 = 0 THEN INSERT *")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_delta.mc_$n GROUP BY 1 ORDER BY 1")
    }),

    // MULTI-FIELD PARTITION SPEC (spec "Partition Specs" fields array):
    // PARTITIONED BY (days(ts), bucket(8, event_id)) stamps a two-field
    // spec; EITHER field's provable conjunct prunes the manifest walk —
    // a key equality hits the bucket component, a ts range the day
    // component. Both premises assert a strict file subset.
    "src_iceberg_write_multispec" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r13_ev_ms")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.ms_$n " +
        "PARTITIONED BY (days(ts), bucket(8, event_id)) " +
        "AS SELECT * FROM r13_ev_ms")
      // bucket-field prune via key equality
      val byKey = s.sql(s"SELECT event_id, event_type " +
        s"FROM graft_iceberg.ms_$n WHERE event_id = 77")
      byKey.collect(): Unit
      val kScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("multispec premise: key equality must record a pruned scan"))
      require(kScan.plannedFiles >= 1 && kScan.plannedFiles * 2 <= kScan.totalFiles,
        s"multispec premise: bucket-component pruning must plan a strict " +
          s"subset, got $kScan")
      // day-field prune via ts range
      val out = s.sql(
        s"""SELECT event_type, count(*) AS cnt,
           |       CAST(sum(event_id) AS BIGINT) AS sum_id
           |FROM graft_iceberg.ms_$n
           |WHERE ts >= '2024-01-20 00:00:00' AND ts < '2024-01-23 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val tScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("multispec premise: the ts range must record a pruned scan"))
      require(tScan.plannedFiles >= 1 && tScan.plannedFiles * 2 <= tScan.totalFiles,
        s"multispec premise: day-component pruning must plan a strict " +
          s"subset, got $tScan")
      out
    }),

    // TIMESTAMP TRAVEL, hudi + iceberg (delta/paimon ride
    // sql_lake_travel_ts): hudi commits stamp commitTimeMs in the
    // instant metadata at write; FOR TIMESTAMP AS OF maps to the
    // latest instant at or before it. Both tables travel to their
    // first commit (evens) next to the current state (everything).
    "sql_lake_travel_ts_hudi" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
        .createOrReplaceTempView("r13_ord_ts")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_hudi.tts_$n " +
        "PRIMARY KEY (o_orderkey) PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r13_ord_ts WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_hudi.tts_$n " +
        "SELECT * FROM r13_ord_ts WHERE o_orderkey % 2 = 1")
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.tts_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r13_ord_ts WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_iceberg.tts_$n " +
        "SELECT * FROM r13_ord_ts WHERE o_orderkey % 2 = 1")
      s.sql(
        s"""SELECT cur.o_orderstatus, cur.n AS n_cur,
           |       coalesce(h1.n, 0) AS n_hudi_t1,
           |       coalesce(i1.n, 0) AS n_iceberg_t1
           |FROM (SELECT o_orderstatus, count(*) AS n
           |      FROM graft_hudi.tts_$n GROUP BY 1) cur
           |LEFT JOIN (SELECT o_orderstatus, count(*) AS n
           |           FROM graft_hudi.tts_$n FOR TIMESTAMP AS OF 1700000000001
           |           GROUP BY 1) h1 ON cur.o_orderstatus = h1.o_orderstatus
           |LEFT JOIN (SELECT o_orderstatus, count(*) AS n
           |           FROM graft_iceberg.tts_$n FOR TIMESTAMP AS OF 1700000000001
           |           GROUP BY 1) i1 ON cur.o_orderstatus = i1.o_orderstatus
           |ORDER BY cur.o_orderstatus""".stripMargin)
    }),

    // ICEBERG CHANGE FEED AS A STREAMING SOURCE: snapshot-id offsets
    // checkpointed by the engine; run 1 ships the initial snapshot,
    // run 2 RESUMES and ships only the appended windows — the premise
    // gate rejects any replayed (key, change) pair. The Iceberg
    // incremental read ships appended files as inserts.
    "stream_iceberg_cdf_source" -> ((s, dir) => {
      import graft.ops.IcebergWriter
      val (ckpt, out) = fresh("iceberg_cdf_source")
      val (_, tableDir0) = fresh("iceberg_cdf_source_table")
      val tableDir = tableDir0
      val base = t(s, dir, "orders").filter(col("o_orderkey") < 8000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      IcebergWriter.append(s, tableDir,
        base.filter(col("o_orderkey") % 2 === 0), Some("o_orderstatus"))
      def runOnce(): Unit = {
        val q = s.readStream.format("graft.streaming.CdfSourceProvider")
          .option("path", tableDir).option("format", "iceberg").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      IcebergWriter.append(s, tableDir,
        base.filter(col("o_orderkey") % 4 === 1), Some("o_orderstatus"))
      IcebergWriter.append(s, tableDir,
        base.filter(col("o_orderkey") % 4 === 3), Some("o_orderstatus"))
      runOnce()
      val events = s.read.parquet(out)
      val replayed = events
        .groupBy(col("o_orderkey"), col("_CHANGE_TYPE"))
        .count().filter(col("count") > 1).limit(1).count()
      require(replayed == 0L,
        "offset resume premise: a restarted stream must not replay " +
          "already-delivered change windows")
      events.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // HUDI CHANGE FEED AS A STREAMING SOURCE: instant offsets; delta
    // log blocks ride _CHANGE_TYPE='upsert', delete blocks 'delete'
    // (non-key columns NULL), new base files 'insert'. Two runs, one
    // checkpoint, resume premise as above; the replica rebuilt from
    // the feed is oracle-checked.
    "stream_hudi_cdf_source" -> ((s, dir) => {
      import graft.ops.HudiLite
      val (ckpt, out) = fresh("hudi_cdf_source")
      val (_, tableDir) = fresh("hudi_cdf_source_table")
      val base = t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      HudiLite.createTable(s, tableDir,
        base.filter(col("o_orderkey") % 2 === 0),
        Seq("o_orderkey"), "o_orderstatus", "001")
      def runOnce(): Unit = {
        val q = s.readStream.format("graft.streaming.CdfSourceProvider")
          .option("path", tableDir).option("format", "hudi")
          .option("keycols", "o_orderkey").load()
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      runOnce()
      HudiLite.upsert(s, tableDir,
        base.filter(col("o_orderkey") % 2 === 1)
          .withColumn("o_custkey", col("o_custkey") + lit(1000000L)),
        Seq("o_orderkey"), "o_orderstatus", "002")
      HudiLite.deleteKeys(s, tableDir,
        base.filter(col("o_orderkey") % 2 === 0 &&
            col("o_orderkey") % 9 === 0)
          .select(col("o_orderkey")),
        Seq("o_orderkey"), "003")
      runOnce()
      val events = s.read.parquet(out)
      val replayed = events
        .groupBy(col("o_orderkey"), col("_CHANGE_TYPE"))
        .count().filter(col("count") > 1).limit(1).count()
      require(replayed == 0L, "offset resume premise violated")
      val live = events.filter(col("_CHANGE_TYPE") =!= "delete")
      val deletes = events.filter(col("_CHANGE_TYPE") === "delete")
        .select(col("o_orderkey"))
      live.join(deletes, Seq("o_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    })
  )

  /** Base rows keep their custkey under the new name; synthetic rows
    * carry id*3. The dropped o_totalprice never shows. */
  private val DropRenameOracle = """
    SELECT o_orderstatus, count(*) AS cnt, CAST(sum(cust) AS BIGINT) AS sum_cust
    FROM (SELECT o_orderstatus, o_custkey AS cust
          FROM orders WHERE o_orderkey < 12000
          UNION ALL
          SELECT 'O' AS o_orderstatus, r * 3 AS cust
          FROM range(90001, 90021) t(r)) u
    GROUP BY 1 ORDER BY 1"""

  def oracle: Map[String, String] = Map(

    "src_iceberg_drop_column" -> DropRenameOracle,
    "src_delta_drop_column" -> DropRenameOracle,
    "src_hudi_drop_column" -> DropRenameOracle,
    "src_paimon_drop_column" -> DropRenameOracle,

    // three zero-match statements later, the table is the CREATE state
    "sql_lake_update_nomatch" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 8000
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_prune_or" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_returnflag IN ('A', 'N')
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_prune_range" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        AND ts < TIMESTAMP '2024-01-13 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_update_prune" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(CASE WHEN l_returnflag = 'R' AND l_orderkey % 2 = 0
                           THEN l_quantity + 500 ELSE l_quantity END)
                  AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    // %7=0 keys replaced with the upserted custkey
    "sql_lake_upsert_bucket" -> """
      SELECT o_orderstatus, count(*) AS cnt, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders WHERE o_orderkey < 10000) u
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_maintenance" -> """
      SELECT l_returnflag, cnt, sum_qty, cnt AS cnt_iceberg,
             sum_qty AS sum_qty_iceberg
      FROM (SELECT l_returnflag, count(*) AS cnt,
                   CAST(sum(l_quantity) AS BIGINT) AS sum_qty
            FROM lineitem
            WHERE l_orderkey < 8000 AND l_orderkey % 3 <> 0
            GROUP BY 1) g
      ORDER BY l_returnflag""",

    // both formats converge on: the %3=0 overwritten rows (+5e6) plus
    // the ten post-overwrite synthetic inserts
    "sql_lake_overwrite_lsm" -> """
      SELECT o_orderstatus, n, sum_ck, n AS n_hudi, sum_ck AS sum_ck_hudi
      FROM (SELECT o_orderstatus, count(*) AS n,
                   CAST(sum(ck) AS BIGINT) AS sum_ck
            FROM (SELECT o_orderstatus, o_custkey + 5000000 AS ck
                  FROM orders
                  WHERE o_orderkey < 9000 AND o_orderkey % 3 = 0
                  UNION ALL
                  SELECT 'O' AS o_orderstatus, r AS ck
                  FROM range(90001, 90011) t(r)) u
            GROUP BY 1) g
      ORDER BY o_orderstatus""",

    // %10=0 matched keys carry +1e6; %10=5 matched keys are gone; even
    // synthetic keys inserted
    "sql_lake_merge_cond" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000 AND o_orderkey % 10 <> 5
            UNION ALL
            SELECT 'O' AS o_orderstatus, r AS ck
            FROM range(90001, 90041) t(r) WHERE r % 2 = 0) u
      GROUP BY 1 ORDER BY 1""",

    "src_iceberg_write_multispec" -> """
      SELECT event_type, count(*) AS cnt,
             CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
        AND ts < TIMESTAMP '2024-01-23 00:00:00'
      GROUP BY 1 ORDER BY 1""",

    // both travel targets are the even half; current is everything
    "sql_lake_travel_ts_hudi" -> """
      SELECT o_orderstatus, count(*) AS n_cur,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hudi_t1,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_iceberg_t1
      FROM orders
      WHERE o_orderkey < 9000
      GROUP BY 1 ORDER BY 1""",

    "stream_iceberg_cdf_source" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 8000
      GROUP BY 1 ORDER BY 1""",

    // evens from the initial snapshot, odds upserted with +1000000,
    // even multiples of 9 (i.e. of 18) deleted
    "stream_hudi_cdf_source" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 2 = 1 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 9000 AND o_orderkey % 18 <> 0) u
      GROUP BY 1 ORDER BY 1"""
  )
}
