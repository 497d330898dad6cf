package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-11: the lakehouse write paths hardened for scale and surfaced
  * in SQL — optimistic concurrent Iceberg commits (spec "Commit
  * conflicts", the CAS-on-version spelling of
  * be/src/exec/operator/iceberg_table_sink_operator.h:44's commit
  * coordination), hot-partition file splitting, the user-facing Hudi
  * MoR upsert/delete writer, Paimon append-only tables and
  * changelog-producer files, and the `graft_<fmt>.<name>` SQL catalog
  * route (plans/LakehouseSql.scala) driving every format's write+read
  * from plain SQL. Oracles recompute expected content from the base
  * tables by predicate — non-circular as always. */
object Round11Queries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CONCURRENT COMMITS: writer B commits between writer A's metadata
    // resolution and CAS publish; A must retry and land on top — the
    // read is the union of all three commits (no lost update). The
    // version chain is asserted so a silently-skipped conflict (A
    // clobbering B) is loud, not a value mismatch.
    "src_iceberg_concurrent" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/conc_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      IcebergWriter.appendHooked(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1 && col("l_orderkey") % 3 =!= 0),
        partCol = Some("l_returnflag"),
        beforePublish = () => {
          IcebergWriter.append(s, tableDir,
            src.filter(col("l_orderkey") % 2 === 1 && col("l_orderkey") % 3 === 0),
            partCol = Some("l_returnflag"))
          ()
        })
      val metaDir = new java.io.File(tableDir, "metadata")
      require((1 to 3).forall(v =>
        new java.io.File(metaDir, s"v$v.metadata.json").exists()),
        "concurrency premise: base + winner + retried loser = 3 versions")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // HOT-PARTITION SPLIT: filesPerPart=4 must break the
    // one-file-per-partition-value funnel (asserted: more files than
    // partition values) while manifest stats still cover every row
    "src_iceberg_hot_split" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/split_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, src,
        partCol = Some("l_returnflag"), filesPerPart = 4)
      val files = IcebergLite.planFiles(tableDir).filter(_.content == 0)
      val nParts = files.flatMap(_.partValue).distinct.size
      require(files.size > nParts,
        s"split premise: ${files.size} files over $nParts partition values")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // USER-FACING HUDI WRITER: createTable (distributed base groups) →
    // upsert (updates + inserts routed through the key index, log
    // files written per file group executor-side) → deleteKeys →
    // MoR snapshot merge through the independent reader
    "src_hudi_write_upsert" -> ((s, dir) => {
      val tableDir = hudiWrittenTable(s, dir)
      graft.ops.HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // PAIMON APPEND-ONLY table: no merge engine — a re-appended subset
    // must count TWICE (the exact opposite of the PK table's dedup),
    // proving the read discipline switches with the table type
    "src_paimon_append_scan" -> ((s, dir) => {
      import graft.ops.{PaimonLite, PaimonWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/paimon/ao_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      PaimonWriter.appendOnly(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), "l_returnflag")
      PaimonWriter.appendOnly(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1)
          .unionByName(src.filter(col("l_orderkey") % 100 === 0)),
        "l_returnflag")
      PaimonLite.readAppendOnly(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // CHANGELOG-PRODUCER=input: the stream over (1, 2] is the INPUT
    // records with RowKind — retractions ship as -D rows, not as
    // folded state
    "src_paimon_changelog" -> ((s, dir) => {
      import graft.ops.{PaimonLite, PaimonWriter}
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
      val tableDir = new java.io.File(
        s"target/paimon/cl_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      PaimonWriter.append(s, tableDir, src,
        "o_orderstatus", Seq("o_orderstatus", "o_orderkey"),
        changelogProducer = true)
      val wave = src.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
        .withColumn("_VALUE_KIND", lit(PaimonLite.KindUpdateAfter))
        .unionByName(src
          .filter(col("o_orderkey") % 9 === 0 && col("o_orderkey") % 10 =!= 0)
          .withColumn("_VALUE_KIND", lit(PaimonLite.KindDelete)))
      PaimonWriter.append(s, tableDir, wave,
        "o_orderstatus", Seq("o_orderstatus", "o_orderkey"),
        changelogProducer = true)
      PaimonLite.readChangelog(s, tableDir, 1L, 2L)
        .groupBy(col("_VALUE_KIND").as("kind"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
        .orderBy(col("kind"))
    }),

    // DELTA CONCURRENT COMMITS: the hard-link CAS on the commit file —
    // POSIX rename (the r10 spelling) would have silently REPLACED the
    // interleaved writer's commit, a lost update the union catches
    "src_delta_concurrent" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/conc_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1 && col("l_orderkey") % 3 =!= 0),
        partCol = Some("l_returnflag"),
        beforePublish = () => {
          DeltaWriter.append(s, tableDir,
            src.filter(col("l_orderkey") % 2 === 1 && col("l_orderkey") % 3 === 0),
            partCol = Some("l_returnflag"))
          ()
        })
      val logDir = new java.io.File(tableDir, "_delta_log")
      require((0L to 2L).forall(v =>
        new java.io.File(logDir, f"$v%020d.json").exists()),
        "concurrency premise: base + winner + retried loser = 3 commits")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // DELTA VACUUM: the reclaim step after DV deletes + OPTIMIZE —
    // superseded data files AND orphaned DV blobs die physically,
    // the current version stays value-exact, expired time travel is
    // loud (all asserted)
    "src_delta_vacuum" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/vac_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir, src, partCol = Some("l_returnflag"))
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      DeltaWriter.optimize(s, tableDir, partColIn = Some("l_returnflag"))
      val deleted = DeltaWriter.vacuum(s, tableDir)
      require(deleted.exists(_.contains("/data/")) &&
        deleted.exists(_.contains("deletion_vectors")),
        s"vacuum must reclaim superseded data + DV bytes: $deleted")
      val loud = try { DeltaLite.readVersion(s, tableDir, Some(0L)).collect(); false }
        catch { case _: Throwable => true }
      require(loud, "time travel past vacuum must fail loudly")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // PAIMON SNAPSHOT EXPIRY: keep the latest snapshot, advance
    // EARLIEST, reclaim expired-only metadata — live LSM layers
    // survive (they are reachable from the kept snapshot), and the
    // folded read stays value-exact
    "src_paimon_expire" -> ((s, dir) => {
      import graft.ops.{PaimonLite, PaimonWriter}
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
      val tableDir = new java.io.File(
        s"target/paimon/exp_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      PaimonWriter.append(s, tableDir, src,
        "o_orderstatus", Seq("o_orderstatus", "o_orderkey"))
      PaimonWriter.append(s, tableDir,
        src.filter(col("o_orderkey") % 10 === 0)
          .withColumn("o_custkey", col("o_custkey") + 1000000L),
        "o_orderstatus", Seq("o_orderstatus", "o_orderkey"))
      val deleted = PaimonWriter.expireSnapshots(tableDir, keepLast = 1)
      require(deleted.nonEmpty, "expiry must reclaim snapshot-1 metadata")
      val loud = try {
        PaimonLite.readSnapshot(s, tableDir,
          Seq("o_orderstatus", "o_orderkey"), Some(1L)).collect(); false
      } catch { case _: Throwable => true }
      require(loud, "expired snapshot must fail loudly")
      PaimonLite.readSnapshot(s, tableDir, Seq("o_orderstatus", "o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // HUDI CLEANER: after compaction folds the API-written logs, the
    // superseded base files and logs die physically; the merged state
    // is untouched (same oracle as src_hudi_write_upsert)
    "src_hudi_clean" -> ((s, dir) => {
      import graft.ops.HudiLite
      val tableDir = hudiWrittenTable(s, dir, suffix = "_clean")
      if (HudiLite.planFilesMor(tableDir).exists(_._5.nonEmpty))
        HudiLite.compact(s, tableDir, Seq("o_orderkey"), "900")
      val cleanedMarker = new java.io.File(tableDir, ".cleaned")
      if (!cleanedMarker.exists()) {
        val deleted = HudiLite.clean(tableDir)
        require(deleted.exists(_.endsWith(".parquet")),
          s"cleaner must reclaim the pre-compaction bases: $deleted")
        java.nio.file.Files.writeString(cleanedMarker.toPath, "1")
      }
      HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // TAGS pin training snapshots through retention (spec "Refs"): the
    // corpus state a model trained on stays time-travelable by NAME
    // while expiry reaps everything else — asserted by expiring down to
    // 1 snapshot and still reading the tag exactly
    "src_iceberg_tag" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val tableDir = new java.io.File(
        s"target/iceberg/tag_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val s1 = IcebergWriter.append(s, tableDir,
        docs.filter(col("doc_id") % 3 =!= 0), partCol = Some("lang"))
      IcebergWriter.tagSnapshot(tableDir, "train_v1", s1)
      IcebergWriter.append(s, tableDir,
        docs.filter(col("doc_id") % 3 === 0), partCol = Some("lang"))
      IcebergWriter.expireSnapshots(tableDir, keepLast = 1)
      require(!IcebergLite.planFiles(tableDir,
          Some(IcebergWriter.resolveRef(tableDir, "train_v1")))
        .isEmpty, "the tagged snapshot must survive expiry")
      IcebergLite.readSnapshot(s, tableDir,
          Some(IcebergWriter.resolveRef(tableDir, "train_v1")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("chk"))
        .orderBy(col("lang"))
    }),

    // RESTORE: unwind an append and a DV delete in one metadata commit,
    // then prove the pre-restore history is still intact
    "src_delta_restore" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/restore_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      DeltaWriter.restore(s, tableDir, 0L)
      // the deleted-state version still replays (restore adds history,
      // never rewrites it)
      val preRestore = DeltaLite.readVersion(s, tableDir, Some(2L)).count()
      require(preRestore > 0, "pre-restore versions must stay readable")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // CHANGE FEED over a version window — the Delta CDC analog
    // completing the incremental-read quartet: the odd-half append
    // ships as inserts, the DV wave as deletes, derived from the log's
    // own dataChange markers (no _change_data files)
    "src_delta_changes" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/cdf_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      DeltaLite.readChanges(s, tableDir, 0L, 2L)
        .groupBy(col("_CHANGE_TYPE").as("change"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("change"))
    }),

    // CDC REPLICATION over the change feed: a replica starts from the
    // v0 snapshot and applies each version window's insert/delete
    // events in order — the replica must equal the live table exactly,
    // proving the windows compose losslessly (the downstream-sync loop
    // a 100 TB deployment runs continuously)
    "src_delta_cdc_replica" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/cdc_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      val replica = (0L until 2L).foldLeft(
        DeltaLite.readVersion(s, tableDir, Some(0L))) { (state, v) =>
        val w = DeltaLite.readChanges(s, tableDir, v, v + 1)
        state
          .unionByName(w.filter(col("_CHANGE_TYPE") === "insert")
            .drop("_CHANGE_TYPE"))
          .join(w.filter(col("_CHANGE_TYPE") === "delete")
            .select(col("l_orderkey")), Seq("l_orderkey"), "left_anti")
      }
      replica
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // SQL-DRIVEN lakehouse round trips — the graft_<fmt> catalog route:
    // CREATE ... AS SELECT, INSERT INTO, DELETE FROM, SELECT all in
    // plain SQL, executing through the in-repo writers/readers
    "sql_lake_iceberg" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("r11_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.li_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r11_li")
      s.sql(s"DELETE FROM graft_iceberg.li_$n WHERE l_orderkey % 3 = 0")
      s.sql(s"SELECT l_returnflag, count(*) AS n, sum(l_orderkey) AS sum_ok " +
        s"FROM graft_iceberg.li_$n GROUP BY 1 ORDER BY 1")
    }),

    "sql_lake_delta" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("r11_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.li_$n " +
        "PARTITIONED BY (l_returnflag) " +
        "AS SELECT * FROM r11_li WHERE l_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_delta.li_$n " +
        "SELECT * FROM r11_li WHERE l_orderkey % 2 = 1")
      s.sql(s"DELETE FROM graft_delta.li_$n WHERE l_orderkey % 5 = 0")
      s.sql(s"SELECT l_returnflag, count(*) AS n, sum(l_orderkey) AS sum_ok " +
        s"FROM graft_delta.li_$n GROUP BY 1 ORDER BY 1")
    }),

    // SQL TIME TRAVEL: FOR VERSION AS OF resolves each format's native
    // coordinate — version 0 of the delta table is the pre-INSERT even
    // half, read next to the current state in ONE statement
    "sql_lake_travel" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
        .createOrReplaceTempView("r11_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.tt_$n " +
        "PARTITIONED BY (l_returnflag) " +
        "AS SELECT * FROM r11_li WHERE l_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_delta.tt_$n " +
        "SELECT * FROM r11_li WHERE l_orderkey % 2 = 1")
      s.sql(
        s"""SELECT cur.l_returnflag, cur.n AS n_cur,
           |       coalesce(v0.n, 0) AS n_v0
           |FROM (SELECT l_returnflag, count(*) AS n
           |      FROM graft_delta.tt_$n GROUP BY 1) cur
           |LEFT JOIN (SELECT l_returnflag, count(*) AS n
           |           FROM graft_delta.tt_$n FOR VERSION AS OF 0
           |           GROUP BY 1) v0
           |  ON cur.l_returnflag = v0.l_returnflag
           |ORDER BY cur.l_returnflag""".stripMargin)
    }),

    // RIGHT-TO-BE-FORGOTTEN on the training corpus — the two product
    // families composed the other way from ml_corpus_versioned: the
    // corpus IS an Iceberg table; a takedown list position-deletes its
    // docs, rewrite folds the deletes into fresh files, expiry
    // physically reclaims the originals — and the premise gate proves
    // NO surviving parquet byte still holds a forgotten doc (the
    // actual GDPR contract: bytes gone, not masked). At 100 TB each
    // step is metadata- or touched-file-sized, never a corpus rewrite
    // beyond the affected partitions.
    "ml_corpus_forget" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val tableDir = new java.io.File(
        s"target/iceberg/forget_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, docs, partCol = Some("lang"))
      IcebergWriter.deleteRows(s, tableDir, col("doc_id") % 37 === 0)
      IcebergWriter.rewriteDataFiles(s, tableDir, partCol = Some("lang"))
      val reclaimed = IcebergWriter.expireSnapshots(tableDir, keepLast = 1)
      require(reclaimed.exists(_.contains("/data/")),
        s"forget must physically reclaim the pre-rewrite files: $reclaimed")
      // the hard premise: scan the RAW surviving files — no forgotten
      // doc id may exist in any byte still on disk
      val survivorFiles = IcebergLite.planFiles(tableDir).map(_.path)
      val leaked = s.read.parquet(survivorFiles: _*)
        .filter(col("doc_id") % 37 === 0).limit(1).count()
      require(leaked == 0L, "forgotten docs must be physically gone")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("chk"))
        .orderBy(col("lang"))
    }),

    "sql_lake_hudi" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r11_ord")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_hudi.ord_$n " +
        "PRIMARY KEY (o_orderkey) PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r11_ord")
      // the INSERT is an upsert: %10 custkeys bump, synthetic keys land
      s.sql(s"INSERT INTO graft_hudi.ord_$n " +
        "SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_orderstatus " +
        "FROM r11_ord WHERE o_orderkey % 10 = 0 " +
        "UNION ALL SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus " +
        "FROM range(90001, 90021)")
      // SQL DELETE via delete blocks (keys resolved by predicate)
      s.sql(s"DELETE FROM graft_hudi.ord_$n " +
        "WHERE o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0 AND o_orderkey < 12000")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS sum_ck " +
        s"FROM graft_hudi.ord_$n GROUP BY 1 ORDER BY 1")
    }),

    "sql_lake_paimon" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
        .createOrReplaceTempView("r11_ord")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.ord_$n " +
        "PRIMARY KEY (o_orderstatus, o_orderkey) " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r11_ord")
      // LSM upsert: the later sequence wins per key
      s.sql(s"INSERT INTO graft_paimon.ord_$n " +
        "SELECT o_orderstatus, o_orderkey, o_custkey + 1000000 AS o_custkey " +
        "FROM r11_ord WHERE o_orderkey % 10 = 0")
      // SQL DELETE via -D retraction rows
      s.sql(s"DELETE FROM graft_paimon.ord_$n " +
        "WHERE o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, sum(o_custkey) AS sum_ck " +
        s"FROM graft_paimon.ord_$n GROUP BY 1 ORDER BY 1")
    })
  )

  /** Hudi table written through the USER-FACING API (createTable /
    * upsert / deleteKeys), cached per sf dir. Premise gates: non-empty
    * waves, unique keys. */
  private val hudiBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def hudiWrittenTable(s: SparkSession, dir: String,
                               suffix: String = ""): String =
    hudiBuilt.computeIfAbsent(dir + suffix, _ => {
      import graft.ops.HudiLite
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val tableDir = new java.io.File(
        s"target/hudi/uw${suffix}_${new java.io.File(dir).getName}").getAbsolutePath
      HudiLite.createTable(s, tableDir, base,
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus",
        instant = "001", groupsPerPart = 2)
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
      val inserts = s.range(90001L, 90021L)
        .select(col("id").as("o_orderkey"), col("id").as("o_custkey"),
          lit("O").as("o_orderstatus"))
      require(updates.limit(1).count() == 1, "upsert premise: updates non-empty")
      HudiLite.upsert(s, tableDir, updates.unionByName(inserts),
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus", instant = "002")
      val dels = base.filter(
        col("o_orderkey") % 7 === 0 && col("o_orderkey") % 10 =!= 0)
        .select(col("o_orderkey"))
      require(dels.limit(1).count() == 1, "delete premise: keys non-empty")
      HudiLite.deleteKeys(s, tableDir, dels,
        keyCols = Seq("o_orderkey"), instant = "003")
      tableDir
    })

  def oracle: Map[String, String] = Map(

    // union of all three interleaved commits — a lost update would
    // drop a residue class and miss
    "src_iceberg_concurrent" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    "src_iceberg_hot_split" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // API-written MoR table: %10 custkeys bumped, %7-not-%10 keys
    // deleted, synthetic 'O' inserts — the same merge contract the
    // fixture-staged src_hudi_mor pins, now through the writer
    "src_hudi_write_upsert" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(ok) AS BIGINT) AS sum_ok,
             CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus, o_orderkey AS ok,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000
              AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
            UNION ALL
            SELECT 'O' AS o_orderstatus, r AS ok, r AS ck
            FROM range(90001, 90021) t(r)) u
      GROUP BY 1 ORDER BY 1""",

    // append-only: duplicates COUNT — the %100 subset rides twice
    "src_paimon_append_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM (SELECT l_returnflag, l_orderkey FROM lineitem
            WHERE l_orderkey < 12000
            UNION ALL
            SELECT l_returnflag, l_orderkey FROM lineitem
            WHERE l_orderkey < 12000 AND l_orderkey % 100 = 0) u
      GROUP BY 1 ORDER BY 1""",

    // the input records of commit 2 with their RowKind codes
    // (2 = +U, 3 = -D)
    "src_paimon_changelog" -> """
      SELECT 2 AS kind, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders WHERE o_orderkey < 12000 AND o_orderkey % 10 = 0
      UNION ALL
      SELECT 3 AS kind, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 12000 AND o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0
      ORDER BY kind""",

    "src_delta_concurrent" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // survivors after the DV wave, unchanged through optimize + vacuum
    "src_delta_vacuum" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    // the folded LSM state by predicate — expiry must not lose a layer
    "src_paimon_expire" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // compaction + cleaning are state no-ops: same merged content as
    // src_hudi_write_upsert
    "src_hudi_clean" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(ok) AS BIGINT) AS sum_ok,
             CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus, o_orderkey AS ok,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000
              AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
            UNION ALL
            SELECT 'O' AS o_orderstatus, r AS ok, r AS ck
            FROM range(90001, 90021) t(r)) u
      GROUP BY 1 ORDER BY 1""",

    // the tag resolves the pre-ingest corpus: batch 1 only
    "src_iceberg_tag" -> """
      SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS chk
      FROM documents
      WHERE doc_id % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    // restore to v0 = the even half, the delete unwound
    "src_delta_restore" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 2 = 0
      GROUP BY 1 ORDER BY 1""",

    // inserts = the odd half; deletes = every %3 row of both halves
    "src_delta_changes" -> """
      SELECT 'delete' AS change, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 = 0
      UNION ALL
      SELECT 'insert' AS change, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 2 = 1
      ORDER BY change""",

    // replica == live table: the %3 survivors of both halves
    "src_delta_cdc_replica" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_iceberg" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_delta" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 5 <> 0
      GROUP BY 1 ORDER BY 1""",

    // current = both halves; v0 = the even half only
    "sql_lake_travel" -> """
      SELECT l_returnflag, count(*) AS n_cur,
             CAST(sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_v0
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    // the corpus minus the takedown list, physically
    "ml_corpus_forget" -> """
      SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS chk
      FROM documents
      WHERE doc_id % 37 <> 0
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_hudi" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000
              AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
            UNION ALL
            SELECT 'O' AS o_orderstatus, r AS ck
            FROM range(90001, 90021) t(r)) u
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_paimon" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
        AND NOT (o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1"""
  )
}
