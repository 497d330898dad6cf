package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-10: the Iceberg single-writer WRITE path
  * (ops/IcebergWriter.scala — reference:
  * be/src/exec/operator/iceberg_table_sink_operator.h:44) proven
  * end-to-end: data is written THROUGH the writer (distributed
  * partitioned parquet pass + footer-stats manifests + metadata-version
  * commit) and read back through the independent [[graft.ops.IcebergLite]]
  * read path; every oracle recomputes expected content from the base
  * lineitem table by predicate, so commit layout, snapshot log, and
  * manifest stats all have to be right to match. */
object Round10Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // two commits (even then odd l_orderkey): the current snapshot must
    // read the union — a writer that dropped the carried-forward
    // manifests would lose commit 1, one that double-listed them would
    // double it
    "src_iceberg_write_scan" -> ((s, dir) => {
      val tableDir = writtenTable(s, dir)
      graft.ops.IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // snapshot 1 = the first commit only (even keys): the written
    // snapshot log must time-travel exactly like a fixture-staged one
    "src_iceberg_write_travel" -> ((s, dir) => {
      val tableDir = writtenTable(s, dir)
      graft.ops.IcebergLite.readSnapshot(s, tableDir, snapshotId = Some(1000L))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // the writer's FOOTER-derived bounds must prune: four band-clustered
    // commits, a band predicate plans exactly ONE of the four written
    // files before any footer opens (asserted), and the values match
    "src_iceberg_write_prune" -> ((s, dir) => {
      import graft.ops.IcebergLite
      val tableDir = bandedTable(s, dir)
      val (mn, mx) = bandRange(s, dir)
      val w = (mx - mn + 1) / 4
      val lo = mn + 2 * w; val hi = mn + 3 * w - 1 // third quartile band
      val pred: (Map[String, Long], Map[String, Long]) => Boolean =
        (l, u) => l.get("l_orderkey").forall(_ <= hi) &&
          u.get("l_orderkey").forall(_ >= lo)
      val all = IcebergLite.planFiles(tableDir).count(_.content == 0)
      val kept = IcebergLite.planFiles(tableDir, statsFilter = Some(pred))
        .filter(_.content == 0)
      require(all == 4 && kept.size == 1,
        s"writer footer stats should plan exactly 1 of $all files, got ${kept.size}")
      IcebergLite.readSnapshot(s, tableDir, statsFilter = Some(pred))
        .filter(col("l_orderkey").between(lo, hi))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // VERSIONED CORPUS with dedup-on-ingest — the two flagship families
    // composed: batch 1 commits to an Iceberg table; batch 2 dedups
    // against the STANDING TABLE (exact md5 anti-join + MinHash-banded
    // near-dup with exact verify, never all-pairs) and commits only the
    // survivors; snapshot 1 shows the pre-ingest corpus. This is the
    // training-data platform loop at 100 TB: the corpus is a table, new
    // shards admit through dedup, every state is time-travelable.
    "ml_corpus_versioned" -> ((s, dir) => {
      import graft.ops.{Dedup, IcebergLite, IcebergWriter}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text"))
      val batch1 = docs.filter(col("doc_id") % 3 =!= 0)
      val batch2 = docs.filter(col("doc_id") % 3 === 0)
      val tableDir = new java.io.File(
        s"target/iceberg/corpus_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.appendBatch(s, tableDir, batch1, batchId = 0L)
      val corpus = IcebergLite.readSnapshot(s, tableDir) // the standing table
      val exactKept = batch2.join(
        corpus.select(md5(col("text")).as("h")).distinct(),
        md5(col("text")) === col("h"), "left_anti")
      val near = Dedup.minhashPairsAcross(corpus, exactKept,
        "doc_id", "text", n = 3, threshold = 0.5)
      val kept = exactKept.join(
        near.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val (nIn, nKept) = {
        val r = batch2.agg(count(lit(1))).head().getLong(0)
        (r, kept.count())
      }
      require(nKept > 0 && nKept < nIn,
        s"ingest premise: dedup must keep some ($nKept) but not all ($nIn)")
      IcebergWriter.appendBatch(s, tableDir, kept, batchId = 1L)
      val v1 = IcebergLite.readSnapshot(s, tableDir, Some(1000L))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_v1"))
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_total"), sum(col("doc_id")).as("chk"))
        .join(v1, Seq("lang"), "left")
        .select(col("lang"), coalesce(col("n_v1"), lit(0L)).as("n_v1"),
          col("n_total"), col("chk"))
        .orderBy(col("lang"))
    }),

    // the snapshots METADATA TABLE over a written table: ids, sequence
    // numbers, deterministic commit stamps, operations
    "src_iceberg_snapshots_table" -> ((s, dir) => {
      val tableDir = writtenTable(s, dir)
      graft.ops.IcebergLite.snapshotsTable(s, tableDir)
        .orderBy(col("snapshot_id"))
    }),

    // the files METADATA TABLE: per partition, file count (one per
    // commit) and exact record counts from the manifests — no data read
    "src_iceberg_files_table" -> ((s, dir) => {
      val tableDir = writtenTable(s, dir)
      val ft = graft.ops.IcebergLite.filesTable(s, tableDir)
        .filter(col("content") === 0)
      ft.groupBy(col("partition"))
        .agg(count(lit(1)).as("n_files"), sum(col("record_count")).as("n_rows"))
        .orderBy(col("partition"))
    }),

    // FOR SYSTEM_TIME AS OF: the stamp of the first commit resolves to
    // snapshot 1 (the even half)
    "src_iceberg_asof" -> ((s, dir) => {
      val tableDir = writtenTable(s, dir)
      graft.ops.IcebergLite.readSnapshotAsOf(s, tableDir, 1700000000001L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // DESCRIBE HISTORY over the delta-written table: three appends'
    // file counts and the partition-delete's tombstone count, with the
    // writers' deterministic stamps
    "src_delta_history" -> ((s, dir) => {
      val tableDir = deltaWrittenTable(s, dir)
      graft.ops.DeltaLite.historyTable(s, tableDir)
        .orderBy(col("version"))
    }),

    // delta timestamp travel: version 1's stamp = both halves, before
    // the R delete
    "src_delta_asof" -> ((s, dir) => {
      val tableDir = deltaWrittenTable(s, dir)
      graft.ops.DeltaLite.readTimestampAsOf(s, tableDir, 1700000000001L)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // COLUMN MAPPING mode name: parquet stores physical col_N names
    // (asserted on a raw file read), partition values key physically,
    // and the reader restores the logical schema from the metaData map
    "src_delta_column_mapping" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/cm_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.appendMapped(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.appendMapped(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      val adds = DeltaLite.planAddsWithCheckpoint(s, tableDir)
      val raw = s.read.parquet(s"$tableDir/${adds.head.path}")
      require(raw.columns.forall(_.startsWith("col_")),
        s"physical layout must not leak logical names: ${raw.columns.toSeq}")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // OPTIMIZE after DV deletes: the rewrite must purge every deletion
    // vector (asserted on the plan), leave one compacted file per
    // partition, and preserve the exact survivor content
    "src_delta_optimize" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/opt_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir, src, partCol = Some("l_returnflag"))
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      DeltaWriter.optimize(s, tableDir, partColIn = Some("l_returnflag"))
      val plan = DeltaLite.planAddsWithCheckpoint(s, tableDir)
      require(plan.nonEmpty && plan.forall(_.dv.isEmpty),
        "optimize must purge every deletion vector")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // the FULL delete lifecycle: mark (position-delete commit) →
    // rewrite (folds deletes into fresh files, plan sheds delete files)
    // → expire (physically reclaims the superseded data AND delete
    // files) — reads stay value-exact through all three
    "src_iceberg_rewrite" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/rw_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, src, partCol = Some("l_returnflag"))
      IcebergWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      IcebergWriter.rewriteDataFiles(s, tableDir, partCol = Some("l_returnflag"))
      val plan = IcebergLite.planFiles(tableDir)
      require(plan.nonEmpty && plan.forall(_.content == 0),
        s"rewrite must shed every delete file: $plan")
      val reclaimed = IcebergWriter.expireSnapshots(tableDir, keepLast = 1)
      require(reclaimed.exists(_.contains("/data/")),
        s"expiry after rewrite must reclaim superseded data files: $reclaimed")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Iceberg writer ROW-LEVEL DELETE via position-delete commits: two
    // waves compose, zero data-file rewrites (asserted on bytes) — the
    // v2 spelling of what src_delta_dv proves for deletion vectors
    "src_iceberg_write_delete" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/wdel_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, src, partCol = Some("l_returnflag"))
      val bytesBefore = new java.io.File(tableDir, "data").listFiles()
        .filter(_.getName.startsWith("w")).map(f => f.getName -> f.length())
        .toSeq.sortBy(_._1)
      IcebergWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      IcebergWriter.deleteRows(s, tableDir, col("l_orderkey") % 5 === 0)
      val bytesAfter = new java.io.File(tableDir, "data").listFiles()
        .filter(_.getName.startsWith("w")).map(f => f.getName -> f.length())
        .toSeq.sortBy(_._1)
      require(bytesBefore == bytesAfter,
        "position deletes must not rewrite any data file")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // ROW-LEVEL DELETE via deletion vectors: two delete commits mark
    // positions dead (z85/roaring64 per PROTOCOL.md) with ZERO parquet
    // rewrites (asserted on file bytes); the second DV must merge with
    // the first; the read anti-joins positions on _metadata
    "src_delta_dv" -> ((s, dir) => {
      import graft.ops.{DeltaLite, DeltaWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/dv_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir, src, partCol = Some("l_returnflag"))
      val bytesBefore = new java.io.File(tableDir, "data").listFiles()
        .map(f => f.getName -> f.length()).toSeq.sortBy(_._1)
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 3 === 0)
      DeltaWriter.deleteRows(s, tableDir, col("l_orderkey") % 5 === 0)
      val bytesAfter = new java.io.File(tableDir, "data").listFiles()
        .map(f => f.getName -> f.length()).toSeq.sortBy(_._1)
      require(bytesBefore == bytesAfter,
        "deletion vectors must not rewrite any data file")
      DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // PARTITION EVOLUTION: the table changes its partition column
    // between commits; a prune on the old column must skip only
    // old-spec files and conservatively keep new-spec ones (you cannot
    // skip a file by a field it was never partitioned on), with the
    // residual filter restoring exactness
    "src_iceberg_partition_evolution" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"))
      val tableDir = new java.io.File(
        s"target/iceberg/pevolve_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_linestatus"))
      val pruned = IcebergLite.planFiles(tableDir,
        partPruneBy = Some(("l_returnflag", (_: String) == "R")))
        .filter(_.content == 0)
      require(pruned.size == 3,
        s"expected commit-1's R file + both commit-2 files, got $pruned")
      IcebergLite.readSnapshot(s, tableDir,
          partPruneBy = Some(("l_returnflag", (_: String) == "R")))
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_linestatus"))
    }),

    // ADD-COLUMN schema evolution: commit 2 writes a column commit 1
    // never had; the merged read surfaces it as NULL on old files —
    // n counts every row, the new column sums only the evolved half
    "src_iceberg_schema_evolution" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity").cast("long").as("l_qty"))
      val tableDir = new java.io.File(
        s"target/iceberg/evolve_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0).drop("l_qty"),
        partCol = Some("l_returnflag"))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1),
        partCol = Some("l_returnflag"))
      val evolved = IcebergLite.readSnapshot(s, tableDir, mergeSchema = true)
      require(evolved.columns.contains("l_qty"),
        "merged read must surface the evolved column")
      evolved
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          count(col("l_qty")).as("n_evolved"),
          sum(col("l_qty")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // snapshot EXPIRY on a dedicated written table: keep only the
    // current snapshot, assert the expired one fails loudly and its
    // now-unreachable manifest metadata is physically gone, then prove
    // the surviving read is still value-exact
    "src_iceberg_expire" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/expire_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      IcebergWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      val deleted = IcebergWriter.expireSnapshots(tableDir, keepLast = 1)
      require(deleted.nonEmpty && deleted.forall(p => !new java.io.File(p).exists()),
        s"expiry must physically delete unreachable metadata: $deleted")
      val loud = try { IcebergLite.planFiles(tableDir, Some(1000L)); false }
        catch { case _: IllegalArgumentException => true }
      require(loud, "expired snapshot must fail loudly, not read stale data")
      IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Paimon writer round trip: insert commit + a mixed upsert/delete
    // commit written through the distributed bucket pass, merged back
    // by the independent LSM read — sequence monotonicity across
    // commits is what makes the upserts win
    "src_paimon_write_scan" -> ((s, dir) => {
      val tableDir = paimonWrittenTable(s, dir)
      graft.ops.PaimonLite.readSnapshot(s, tableDir,
          Seq("o_orderstatus", "o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // snapshot 1 of the written table = pure inserts
    "src_paimon_write_travel" -> ((s, dir) => {
      val tableDir = paimonWrittenTable(s, dir)
      graft.ops.PaimonLite.readSnapshot(s, tableDir,
          Seq("o_orderstatus", "o_orderkey"), snapshotId = Some(1L))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // Delta writer round trip: two distributed append commits + a
    // partition-delete tombstone, read back through the independent
    // log-replay reader
    "src_delta_write_scan" -> ((s, dir) => {
      val tableDir = deltaWrittenTable(s, dir)
      graft.ops.DeltaLite.readVersion(s, tableDir)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // writer UPSERT (merge-on-write via equality deletes): base commit
    // + an upsert commit that replaces %10 custkeys and inserts a
    // synthetic key range, all without rewriting the base files — the
    // reader's sequence-visibility rule must merge exactly
    "src_iceberg_write_upsert" -> ((s, dir) => {
      val tableDir = upsertTable(s, dir)
      graft.ops.IcebergLite.readSnapshot(s, tableDir)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // Paimon PARTIAL-UPDATE merge engine: three commits of
    // column-sparse writes fold per key in sequence order — non-null
    // overwrites, -D resets, a later sparse write rebuilds the row with
    // the untouched columns NULL. A "last row wins" reader would lose
    // kept columns; one that let deleted state leak into the rebuild
    // would resurrect pre-delete priorities.
    "src_paimon_partial_update" -> ((s, dir) => {
      val tableDir = paimonPuTable(s, dir)
      graft.ops.PaimonLite.readSnapshotPartialUpdate(s, tableDir,
          Seq("o_orderstatus", "o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("priority"))
    }),

    // Paimon AGGREGATION merge engine: per-key combine under declared
    // per-column functions (Sum + Max here), across two snapshots —
    // the AGG-keys table-model semantics over the LSM layout
    "src_paimon_agg_merge" -> ((s, dir) => {
      import graft.ops.{PaimonLite, TableModels}
      val tableDir = paimonAggTable(s, dir)
      PaimonLite.readSnapshotAggMerge(s, tableDir,
          Seq("l_returnflag", "l_orderkey"),
          Seq("l_qty" -> TableModels.Sum, "l_linenumber" -> TableModels.Max))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_qty")).as("sum_qty"),
          sum(col("l_linenumber").cast("long")).as("sum_ln"))
        .orderBy(col("l_returnflag"))
    }),

    // Hudi merge-on-read at the current instant: two log layers + log
    // deletes merged over the base slices. A reader that skipped the
    // .log files (the r9 gap) would show pre-upsert custkeys and
    // deleted keys; one that let 002's record beat 003's would show
    // +1000000 where +2000000 is right.
    "src_hudi_mor" -> ((s, dir) => {
      val tableDir = hudiMorTable(s, dir)
      graft.ops.HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // incremental changelog over (001, 003]: both deltacommits' log
    // records ship — %10 upserts from 002, %20 upserts AGAIN from 003
    // (a changelog ships every change, not the folded state), deletes
    // with their kind
    "src_hudi_incremental" -> ((s, dir) => {
      val tableDir = hudiMorTable(s, dir)
      graft.ops.HudiLite.readIncrementalMor(s, tableDir, "001", "003")
        .groupBy(col("_CHANGE_TYPE").as("change"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
        .orderBy(col("change"))
    }),

    // MoR COMPACTION on a dedicated fixture copy: the rewrite must be a
    // state no-op (same oracle as src_hudi_mor), the plan must carry no
    // logs afterwards, and only logged groups may rewrite — the
    // maintenance write that keeps MoR read amplification bounded
    "src_hudi_mor_compact" -> ((s, dir) => {
      import graft.ops.HudiLite
      val tableDir = hudiMorTable(s, dir, suffix = "_compact")
      if (HudiLite.planFilesMor(tableDir).exists(_._5.nonEmpty))
        HudiLite.compact(s, tableDir, Seq("o_orderkey"), "900")
      val plan = HudiLite.planFilesMor(tableDir)
      require(plan.nonEmpty && plan.forall(_._5.isEmpty),
        s"post-compaction plan must carry no logs")
      HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("sum_ok"),
          sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // time travel INTO the log layers: instant 002 sees the first
    // upsert+delete wave but not 003's overwrite
    "src_hudi_mor_travel" -> ((s, dir) => {
      val tableDir = hudiMorTable(s, dir)
      graft.ops.HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"),
          instant = Some("002"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    })
  )

  /** Paimon-written table on orders (key uniqueness premise-gated):
    * commit 1 inserts everything; commit 2 mixes +U rows (custkey
    * +1000000 on %10 keys) and -D rows (%9 keys not %10) in ONE
    * distributed write. */
  private val paimonWrittenBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def paimonWrittenTable(s: SparkSession, dir: String): String =
    paimonWrittenBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.{PaimonLite, PaimonWriter}
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
      locally {
        val (n, nd) = {
          val r = src.agg(count(lit(1)), countDistinct(col("o_orderkey"))).head()
          (r.getLong(0), r.getLong(1))
        }
        require(n == nd && n > 0,
          s"paimon writer fixture premise violated: $n rows, $nd distinct keys")
      }
      val tableDir = new java.io.File(
        s"target/paimon/written_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val keys = Seq("o_orderstatus", "o_orderkey")
      PaimonWriter.append(s, tableDir, src, "o_orderstatus", keys, numBuckets = 4)
      val ups = src.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
        .withColumn("_VALUE_KIND", lit(PaimonLite.KindUpdateAfter))
      val dels = src.filter(col("o_orderkey") % 9 === 0 && col("o_orderkey") % 10 =!= 0)
        .withColumn("_VALUE_KIND", lit(PaimonLite.KindDelete))
      PaimonWriter.append(s, tableDir, ups.unionByName(dels),
        "o_orderstatus", keys, numBuckets = 4)
      tableDir
    })

  /** Delta-written table: even/odd append commits partitioned by
    * l_returnflag, then a partition-delete of 'R' — the surviving state
    * is both halves minus the whole R partition. */
  private val deltaWrittenBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def deltaWrittenTable(s: SparkSession, dir: String): String =
    deltaWrittenBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.DeltaWriter
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/delta/written_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 0), partCol = Some("l_returnflag"))
      DeltaWriter.append(s, tableDir,
        src.filter(col("l_orderkey") % 2 === 1), partCol = Some("l_returnflag"))
      DeltaWriter.deleteWhere(s, tableDir, _.get("l_returnflag").contains("R"))
      tableDir
    })

  /** Upsert-written table: append orders (o_orderkey < 12000), then
    * ONE upsert commit carrying replaced rows (%10 keys, custkey
    * +1000000) and brand-new rows (keys 90001..90020, custkey = key,
    * status 'X') — replacement and insertion must both ride the same
    * equality-delete commit. */
  private val upsertBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def upsertTable(s: SparkSession, dir: String): String =
    upsertBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.IcebergWriter
      val src = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val tableDir = new java.io.File(
        s"target/iceberg/upsert_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, src, partCol = Some("o_orderstatus"))
      val replaced = src.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
      val fresh = s.range(90001, 90021)
        .select(col("id").as("o_orderkey"), col("id").as("o_custkey"),
          lit("X").as("o_orderstatus"))
      require(replaced.limit(1).count() == 1,
        "upsert fixture premise: replacement set must be non-empty")
      IcebergWriter.upsert(s, tableDir, replaced.unionByName(fresh),
        keyCols = Seq("o_orderkey"), partCol = Some("o_orderstatus"))
      tableDir
    })

  /** Paimon partial-update fixture on orders (key uniqueness
    * premise-gated): c1 full inserts; c2 custkey-only updates
    * (+1000000 on %10==0) and deletes (%9==0 not %10); c3
    * priority-only updates ('RUSH' on %4==0) — %36-with-%10!=0 keys
    * exercise the delete-then-sparse-rebuild path (custkey must come
    * back NULL, not the pre-delete value). */
  private val paimonPuBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def paimonPuTable(s: SparkSession, dir: String): String =
    paimonPuBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.PaimonLite
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val sysSchema = StructType(Seq(
        StructField("o_orderstatus", StringType),
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderpriority", StringType),
        StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
        StructField("_VALUE_KIND", IntegerType, nullable = false)))
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
        .collect().toSeq
      require(base.map(r => (r.getString(0), r.getLong(1))).distinct.size == base.size,
        "paimon PU fixture premise violated: (o_orderstatus, o_orderkey) not unique")
      val c1 = base.zipWithIndex.map { case (r, i) =>
        Row(r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
          1000000L + i, PaimonLite.KindInsert) }
      val c2 = base.zipWithIndex.flatMap { case (r, i) =>
        val k = r.getLong(1)
        if (k % 10 == 0)
          Some(Row(r.getString(0), k, r.getLong(2) + 1000000L, null,
            2000000L + i, PaimonLite.KindUpdateAfter))
        else if (k % 9 == 0)
          Some(Row(r.getString(0), k, null, null,
            2000000L + i, PaimonLite.KindDelete))
        else None
      }
      val c3 = base.zipWithIndex.flatMap { case (r, i) =>
        val k = r.getLong(1)
        if (k % 4 == 0)
          Some(Row(r.getString(0), k, null, "RUSH",
            3000000L + i, PaimonLite.KindUpdateAfter))
        else None
      }
      require(c2.nonEmpty && c3.nonEmpty,
        "paimon PU fixture premise: update commits must be non-empty")
      def writes(rows: Seq[Row]): Seq[PaimonLite.Write] =
        rows.groupBy(r => (r.getString(0), (r.getLong(1) % 3).toInt)).toSeq
          .sortBy(_._1)
          .map { case ((p, b), rs) => PaimonLite.Write(Some(p), b, 0, rs) }
      val tableDir = new java.io.File(
        s"target/paimon/pu_orders_${new java.io.File(dir).getName}").getAbsolutePath
      PaimonLite.writeFixtureTable(s, tableDir, sysSchema, Seq(
        PaimonLite.Commit("APPEND", writes(c1)),
        PaimonLite.Commit("APPEND", writes(c2)),
        PaimonLite.Commit("APPEND", writes(c3))))
      tableDir
    })

  /** Paimon aggregation-merge fixture on lineitem: key
    * (l_returnflag, l_orderkey) has MANY rows by construction (the
    * lineitems of an order) split across two snapshots by linenumber
    * parity, so the combine must cross snapshots. */
  private val paimonAggBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def paimonAggTable(s: SparkSession, dir: String): String =
    paimonAggBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.PaimonLite
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val sysSchema = StructType(Seq(
        StructField("l_returnflag", StringType),
        StructField("l_orderkey", LongType),
        StructField("l_qty", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
        StructField("_VALUE_KIND", IntegerType, nullable = false)))
      val base = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 15000)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_quantity").cast("long").as("l_qty"), col("l_linenumber"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_qty"))
        .collect().toSeq
      val (odd, even) = base.partition(_.getInt(3) % 2 == 1)
      require(odd.nonEmpty && even.nonEmpty,
        "paimon AGG fixture premise: both parity snapshots must be non-empty")
      def rows(rs: Seq[Row], seqBase: Long): Seq[Row] =
        rs.zipWithIndex.map { case (r, i) =>
          Row(r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3),
            seqBase + i, PaimonLite.KindInsert) }
      def writes(rs: Seq[Row]): Seq[PaimonLite.Write] =
        rs.groupBy(r => (r.getString(0), (r.getLong(1) % 3).toInt)).toSeq
          .sortBy(_._1)
          .map { case ((p, b), g) => PaimonLite.Write(Some(p), b, 0, g) }
      val tableDir = new java.io.File(
        s"target/paimon/agg_lineitem_${new java.io.File(dir).getName}").getAbsolutePath
      PaimonLite.writeFixtureTable(s, tableDir, sysSchema, Seq(
        PaimonLite.Commit("APPEND", writes(rows(odd, 1000000L))),
        PaimonLite.Commit("APPEND", writes(rows(even, 2000000L)))))
      tableDir
    })

  /** Hudi MERGE-ON-READ fixture on the orders table (o_orderkey is
    * verified unique — premise gate below): COW commit 001 = base
    * slices per o_orderstatus partition; deltacommit 002 = log upserts
    * (+1000000 custkey on %10==0 keys) and log deletes (%7==0 keys not
    * upserted); deltacommit 003 = a second upsert layer (+2000000 on
    * %20==0 keys — OverwriteWithLatestAvroPayload: the LATEST record
    * wins entirely, it does not accumulate). */
  private val hudiMorBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def hudiMorTable(s: SparkSession, dir: String,
                           suffix: String = ""): String =
    hudiMorBuilt.computeIfAbsent(dir + suffix, _ => {
      import graft.ops.HudiLite
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType)))
      val base = t(s, dir, "orders")
        .filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
        .collect().toSeq
      require(base.map(_.getLong(0)).distinct.size == base.size,
        "hudi MoR fixture premise violated: o_orderkey is not unique")
      require(base.nonEmpty, "hudi MoR fixture premise: base is empty")
      val tableDir = new java.io.File(
        s"target/hudi/mor_orders${suffix}_${new java.io.File(dir).getName}").getAbsolutePath
      val byPart = base.groupBy(_.getString(2)).toSeq.sortBy(_._1)
      HudiLite.writeFixtureTable(s, tableDir,
        s.createDataFrame(new java.util.ArrayList[Row](), schema),
        Seq(HudiLite.Commit("001",
          byPart.map { case (p, rows) => (p, s"f_$p", rows) })))
      def blocksFor(rows: Seq[Row], instant: String): Seq[HudiLite.LogBlock] = {
        val ups = rows.filter(_.getLong(0) % 10 == 0).map(r =>
          Row(r.getLong(0), r.getLong(1) + 1000000L, r.getString(2)))
        val dels = rows.filter(r => r.getLong(0) % 7 == 0 && r.getLong(0) % 10 != 0)
          .map(r => Row(r.getLong(0)))
        Seq(
          if (ups.nonEmpty) Some(HudiLite.LogBlock(HudiLite.BlockData, instant, ups, schema)) else None,
          if (dels.nonEmpty) Some(HudiLite.LogBlock(HudiLite.BlockDelete, instant, dels,
            StructType(Seq(StructField("o_orderkey", LongType))))) else None
        ).flatten
      }
      val w2 = byPart.flatMap { case (p, rows) =>
        val bs = blocksFor(rows, "002")
        if (bs.isEmpty) None else Some((p, s"f_$p", "001", bs))
      }
      val w3 = byPart.flatMap { case (p, rows) =>
        val ups = rows.filter(_.getLong(0) % 20 == 0).map(r =>
          Row(r.getLong(0), r.getLong(1) + 2000000L, r.getString(2)))
        if (ups.isEmpty) None
        else Some((p, s"f_$p", "001",
          Seq(HudiLite.LogBlock(HudiLite.BlockData, "003", ups, schema))))
      }
      require(w2.nonEmpty && w3.nonEmpty,
        "hudi MoR fixture premise: both delta commits must write logs")
      HudiLite.writeDeltaCommits(tableDir, Seq(
        HudiLite.DeltaCommit("002", w2), HudiLite.DeltaCommit("003", w3)))
      tableDir
    })

  /** Two-commit table written through IcebergWriter: commit 1 = even
    * l_orderkey, commit 2 = odd, identity-partitioned by l_returnflag.
    * Premise gates (r9 lesson): the expected snapshot ids and the
    * commit split are asserted at staging time so a broken premise is a
    * loud `err`, never a silent value mismatch. */
  private val built = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def writtenTable(s: SparkSession, dir: String): String =
    built.computeIfAbsent(dir, _ => {
      import graft.ops.IcebergWriter
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 12000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val tableDir = new java.io.File(
        s"target/iceberg/written_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val even = src.filter(col("l_orderkey") % 2 === 0)
      val odd = src.filter(col("l_orderkey") % 2 === 1)
      require(even.limit(1).count() == 1 && odd.limit(1).count() == 1,
        "fixture premise: both commits must be non-empty")
      val s1 = IcebergWriter.append(s, tableDir, even, partCol = Some("l_returnflag"))
      val s2 = IcebergWriter.append(s, tableDir, odd, partCol = Some("l_returnflag"))
      require(s1 == 1000L && s2 == 1001L, s"unexpected snapshot ids $s1/$s2")
      tableDir
    })

  /** Four commits band-clustered on l_orderkey (unpartitioned), so each
    * written file's footer bounds carry one disjoint range — the
    * clustered-ingestion shape that makes stats pruning decisive. */
  private val bandedBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bandRange(s: SparkSession, dir: String): (Long, Long) = {
    val r = t(s, dir, "lineitem").filter(col("l_orderkey") < 16000)
      .agg(min(col("l_orderkey")), max(col("l_orderkey"))).head()
    (r.getLong(0), r.getLong(1))
  }
  private def bandedTable(s: SparkSession, dir: String): String =
    bandedBuilt.computeIfAbsent(dir, _ => {
      import graft.ops.IcebergWriter
      val src = t(s, dir, "lineitem")
        .filter(col("l_orderkey") < 16000)
        .select(col("l_orderkey"), col("l_returnflag"))
      val (mn, mx) = bandRange(s, dir)
      val w = (mx - mn + 1) / 4
      val tableDir = new java.io.File(
        s"target/iceberg/written_bands_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      (0 until 4).foreach { b =>
        val lo = mn + b * w
        val hi = if (b == 3) mx else mn + (b + 1) * w - 1
        val band = src.filter(col("l_orderkey").between(lo, hi)).coalesce(1)
        require(band.limit(1).count() == 1, s"fixture premise: band $b non-empty")
        IcebergWriter.append(s, tableDir, band, partCol = None)
      }
      tableDir
    })

  def oracle: Map[String, String] = Map(

    "src_iceberg_write_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    "src_iceberg_write_travel" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000 AND l_orderkey % 2 = 0
      GROUP BY 1 ORDER BY 1""",

    // the final corpus = batch 1 plus batch 2's dedup survivors, with
    // snapshot 1 = batch 1 alone; the near-dup rule is the same exact
    // 3-shingle Jaccard >= 0.5 recomputation ml_dedup_incremental pins
    "ml_corpus_versioned" -> s"""
      WITH corpus AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
      inc AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
      ek AS (SELECT * FROM inc
             WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus)),
      s_c AS (SELECT doc_id, ${MlQueries.shingleSql} AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus) w),
      s_i AS (SELECT doc_id, ${MlQueries.shingleSql} AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM ek) w),
      near AS (SELECT DISTINCT b.doc_id
               FROM s_c a JOIN s_i b
                 ON len(list_intersect(a.sh, b.sh))::DOUBLE /
                    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
                    >= 0.5),
      kept AS (SELECT * FROM ek
               WHERE doc_id NOT IN (SELECT doc_id FROM near))
      SELECT lang,
             CAST(sum(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_v1,
             count(*) AS n_total,
             CAST(sum(doc_id) AS BIGINT) AS chk
      FROM (SELECT lang, doc_id, 1 AS src FROM corpus
            UNION ALL SELECT lang, doc_id, 2 AS src FROM kept) u
      GROUP BY 1 ORDER BY 1""",

    // fixture-deterministic snapshot log (ids 1000+, stamps
    // 1700000000000 + sequence)
    "src_iceberg_snapshots_table" -> """
      SELECT * FROM (VALUES
        (CAST(1000 AS BIGINT), CAST(1 AS BIGINT),
         CAST(1700000000001 AS BIGINT), 'append'),
        (CAST(1001 AS BIGINT), CAST(2 AS BIGINT),
         CAST(1700000000002 AS BIGINT), 'append'))
      t(snapshot_id, sequence_number, committed_at_ms, operation)
      ORDER BY snapshot_id""",

    // manifest record counts must equal the data: one file per commit
    // per flag, rows = the flag's count
    "src_iceberg_files_table" -> """
      SELECT l_returnflag AS partition, CAST(2 AS BIGINT) AS n_files,
             count(*) AS n_rows
      FROM lineitem WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // as-of the first commit stamp = the even half only
    "src_iceberg_asof" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000 AND l_orderkey % 2 = 0
      GROUP BY 1 ORDER BY 1""",

    // v0/v1 append 3 files each (A,N,R both halves); v2 tombstones the
    // two R files
    "src_delta_history" -> """
      SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), CAST(1700000000000 AS BIGINT),
         CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(1 AS BIGINT), CAST(1700000000001 AS BIGINT),
         CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
        (CAST(2 AS BIGINT), CAST(1700000000002 AS BIGINT),
         CAST(0 AS BIGINT), CAST(2 AS BIGINT)))
      t(version, timestamp_ms, n_adds, n_removes)
      ORDER BY version""",

    // as-of version 1's stamp: both halves, R not yet deleted
    "src_delta_asof" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // the logical view equals the plain predicate — mapping is pure
    // indirection
    "src_delta_column_mapping" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    // survivors unchanged by the rewrite
    "src_delta_optimize" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    // survivors unchanged through rewrite and reclaim
    "src_iceberg_rewrite" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
      GROUP BY 1 ORDER BY 1""",

    // same survivor set as the DV spelling
    "src_iceberg_write_delete" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_orderkey < 10000
        AND l_orderkey % 3 <> 0 AND l_orderkey % 5 <> 0
      GROUP BY 1 ORDER BY 1""",

    // survivors after both DV waves
    "src_delta_dv" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(l_linenumber) AS BIGINT) AS sum_ln
      FROM lineitem
      WHERE l_orderkey < 10000
        AND l_orderkey % 3 <> 0 AND l_orderkey % 5 <> 0
      GROUP BY 1 ORDER BY 1""",

    // spec-aware prune + residual filter = the plain predicate
    "src_iceberg_partition_evolution" -> """
      SELECT l_linestatus, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_returnflag = 'R'
      GROUP BY 1 ORDER BY 1""",

    // pre-evolution rows read the new column as NULL: counted in n,
    // absent from n_evolved/sum_qty
    "src_iceberg_schema_evolution" -> """
      SELECT l_returnflag, count(*) AS n,
             count(CASE WHEN l_orderkey % 2 = 1 THEN 1 END) AS n_evolved,
             CAST(sum(CASE WHEN l_orderkey % 2 = 1
                           THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    // expiry must not lose a row: the whole written set survives
    "src_iceberg_expire" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    // written-table merge by predicate: %9-not-%10 keys deleted, %10
    // custkeys bumped
    "src_paimon_write_scan" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
        AND NOT (o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    "src_paimon_write_travel" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    // both halves minus the deleted R partition
    "src_delta_write_scan" -> """
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE l_orderkey < 12000 AND l_returnflag <> 'R'
      GROUP BY 1 ORDER BY 1""",

    // merged state by predicate: %10 custkeys bumped, synthetic 'X'
    // rows appended
    "src_iceberg_write_upsert" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
      GROUP BY 1
      UNION ALL
      SELECT 'X' AS o_orderstatus, 20 AS n,
             CAST(sum(r) AS BIGINT) AS sum_ok, CAST(sum(r) AS BIGINT) AS sum_ck
      FROM range(90001, 90021) t(r)
      ORDER BY o_orderstatus""",

    // fold result recomputed by predicate: survivors are non-deleted
    // rows plus %4==0 rebuilds; priority is RUSH wherever c3 touched;
    // custkey is NULL on rebuilt rows, +1000000 on %10 updates
    "src_paimon_partial_update" -> """
      WITH s AS (
        SELECT o_orderkey AS k, o_custkey AS c, o_orderpriority AS pr,
               (o_orderkey % 9 = 0 AND o_orderkey % 10 <> 0) AS del,
               (o_orderkey % 4 = 0) AS upd3,
               (o_orderkey % 10 = 0) AS upd2
        FROM orders WHERE o_orderkey < 12000)
      SELECT CASE WHEN upd3 THEN 'RUSH' ELSE pr END AS priority,
             count(*) AS n,
             CAST(sum(k) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN del THEN NULL
                           WHEN upd2 THEN c + 1000000
                           ELSE c END) AS BIGINT) AS sum_ck
      FROM s
      WHERE (NOT del) OR upd3
      GROUP BY 1 ORDER BY 1""",

    // per-key Sum/Max combine, then the wrap-up rollup — grouped the
    // same way on both sides
    "src_paimon_agg_merge" -> """
      WITH m AS (
        SELECT l_returnflag, l_orderkey,
               sum(CAST(l_quantity AS BIGINT)) AS sum_qty,
               max(l_linenumber) AS max_ln
        FROM lineitem WHERE l_orderkey < 15000
        GROUP BY 1, 2)
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(sum_qty) AS BIGINT) AS sum_qty,
             CAST(sum(max_ln) AS BIGINT) AS sum_ln
      FROM m GROUP BY 1 ORDER BY 1""",

    // survivors: %7==0 keys die unless upserted (%10==0); custkey is
    // the LATEST overwrite — +2000000 for %20==0, else +1000000 for
    // %10==0, else base
    "src_hudi_mor" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN o_orderkey % 20 = 0 THEN o_custkey + 2000000
                           WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
        AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    // the changelog multiset: deletes = %7-not-%10 keys once; upserts =
    // %10 keys (002) plus %20 keys again (003). HAVING guards empty
    // branches to match groupBy semantics
    "src_hudi_incremental" -> """
      SELECT 'delete' AS change, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 12000 AND o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0
      HAVING count(*) > 0
      UNION ALL
      SELECT 'upsert' AS change,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END)
                  + sum(CASE WHEN o_orderkey % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey ELSE 0 END)
                  + sum(CASE WHEN o_orderkey % 20 = 0 THEN o_orderkey ELSE 0 END) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 12000
      HAVING sum(CASE WHEN o_orderkey % 10 = 0 THEN 1 ELSE 0 END) > 0
      ORDER BY change""",

    // compaction is a state no-op: same merged state as src_hudi_mor
    "src_hudi_mor_compact" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok,
             CAST(sum(CASE WHEN o_orderkey % 20 = 0 THEN o_custkey + 2000000
                           WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
        AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    // at instant 002: only the first upsert wave (+1000000 on %10==0)
    "src_hudi_mor_travel" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                           ELSE o_custkey END) AS BIGINT) AS sum_ck
      FROM orders
      WHERE o_orderkey < 12000
        AND NOT (o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0)
      GROUP BY 1 ORDER BY 1""",

    // third quartile band, derived exactly as the fixture derives it
    "src_iceberg_write_prune" -> """
      WITH b AS (SELECT min(l_orderkey) AS mn, max(l_orderkey) AS mx
                 FROM lineitem WHERE l_orderkey < 16000),
      r AS (SELECT mn + 2 * ((mx - mn + 1) // 4) AS lo,
                   mn + 3 * ((mx - mn + 1) // 4) - 1 AS hi FROM b)
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem, r
      WHERE l_orderkey BETWEEN r.lo AND r.hi
      GROUP BY 1 ORDER BY 1"""
  )
}
