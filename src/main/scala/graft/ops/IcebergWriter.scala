package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Iceberg v2 single-writer WRITE path from the PUBLIC spec
  * (iceberg.apache.org/spec, "Commit conflicts" / "File System Tables")
  * — the inverse of [[IcebergLite]]'s reader and the in-repo answer to
  * the reference's lakehouse sinks
  * (be/src/exec/operator/iceberg_table_sink_operator.h:44): stage data
  * files, append a manifest, write the new metadata version, bump the
  * version pointer.
  *
  * Spark-first split of the work, the same FE/BE split the reader uses:
  *  - the DATA write is fully distributed — one
  *    `df.write.partitionBy(part).parquet(staging)` pass; with a
  *    pre-`repartition` on the partition column each identity
  *    partition value lands in exactly one task and so one file (the
  *    clustered-write shape whose manifest bounds make
  *    `src_iceberg_stats_prune`-style skipping possible at 100 TB);
  *  - per-file STATS (record count, lower/upper bounds) are read from
  *    the staged parquet FOOTERS — metadata-sized driver work, the
  *    exact stats a production writer accumulates while streaming rows;
  *  - the COMMIT is the spec's file-system-table protocol: manifest
  *    avro for the new files, a manifest list carrying the previous
  *    snapshot's manifests forward plus the new one, a new
  *    `vN.metadata.json` with the full snapshot log, and LAST the
  *    `version-hint.text` swap — the single atomic commit point, so a
  *    reader never observes a half-written snapshot.
  *
  * Honest scope (documented, not hidden): SINGLE writer — the
  * optimistic retry loop of the spec's concurrent-commit protocol
  * (compare-and-swap on the version hint, re-resolving manifests on
  * conflict) is out of scope; append snapshots only (row-level deletes
  * ride [[IcebergLite]]'s read-side position/equality delete support);
  * identity partition transforms; bounds for integral columns.
  * Round-trip correctness is non-circular: `src_iceberg_write_*`
  * oracles recompute expected content from the base table by predicate,
  * and the spec verifies the written layout with the same parsers the
  * read-path fixtures use. */
object IcebergWriter {

  private def mapper = new ObjectMapper()

  /** Append `df` to the table at `tableDir` as one snapshot, creating
    * the table on first use. `partCol` selects identity partitioning
    * (one data file per partition value). Returns the new snapshot id. */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
             partCol: Option[String] = None): Long =
    commit(spark, tableDir, df, partCol, upsertKeys = None)

  /** UPSERT commit — merge-on-write via v2 EQUALITY DELETES: one
    * snapshot holding an equality-delete file of the incoming keys plus
    * the new data files. The spec's sequence-visibility rule does the
    * merge at read time with no rewrite of existing data: the delete
    * (sequence S) removes matching keys only from data files with
    * sequence < S, and the same-commit data files (sequence = S)
    * survive — exactly the upsert contract [[IcebergLite.readSnapshot]]
    * already enforces. At 100 TB this is the write path that makes CDC
    * ingestion cheap: old files are never rewritten, the read-side
    * anti-join shuffles only the delete keys. */
  def upsert(spark: SparkSession, tableDir: String, df: DataFrame,
             keyCols: Seq[String], partCol: Option[String] = None): Long = {
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains),
      s"upsert keys ${keyCols.mkString(",")} must be df columns")
    commit(spark, tableDir, df, partCol, upsertKeys = Some(keyCols))
  }

  /** REWRITE DATA FILES (the rewrite_data_files / compaction
    * maintenance action): materialize the current snapshot — position
    * and equality deletes applied — into fresh compacted files and
    * commit them as a REPLACE snapshot whose manifest list references
    * ONLY the new manifest. Reads stop paying the delete anti-joins,
    * and the superseded data/delete files become unreachable from the
    * new snapshot — [[expireSnapshots]] then physically reclaims them,
    * which is the full delete lifecycle at 100 TB: mark (deleteRows) →
    * merge-on-read → rewrite → expire. Old snapshots still time travel
    * until expiry. */
  def rewriteDataFiles(spark: SparkSession, tableDir: String,
                       partCol: Option[String] = None): Long = {
    val state = IcebergLite.readSnapshot(spark, tableDir)
    commit(spark, tableDir, state, partCol, upsertKeys = None,
      summaryProps = Map.empty, replaceAll = true)
  }

  /** ROW-LEVEL DELETE via v2 POSITION DELETES: one distributed scan
    * finds matching (file_path, pos) pairs and writes them as a
    * position-delete parquet — the spec's content=1 file the read side
    * already anti-joins — committed as one snapshot with no data
    * rewrite. The sibling of [[DeltaWriter.deleteRows]]'s deletion
    * vectors: same contract, the other protocol's spelling. */
  def deleteRows(spark: SparkSession, tableDir: String,
                 cond: org.apache.spark.sql.Column): Long = {
    val dataTasks = IcebergLite.planFiles(tableDir).filter(_.content == 0)
    require(dataTasks.nonEmpty, "empty table")
    val matched = spark.read.parquet(dataTasks.map(_.path): _*)
      .withColumn("file_path",
        regexp_replace(col("_metadata.file_path"), "^file:+", ""))
      .withColumn("pos", col("_metadata.row_index"))
      .filter(cond)
      .select(col("file_path"), col("pos"))
    require(!matched.isEmpty, "deleteRows matched no rows")

    val hintPath = java.nio.file.Paths.get(tableDir, "metadata", "version-hint.text")
    val curVersion = java.nio.file.Files.readString(hintPath).trim.toInt
    val meta = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(tableDir, "metadata", s"v$curVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    val seq = meta.get("last-sequence-number").asLong + 1
    val snaps0 = meta.get("snapshots")
    val snapId = (0 until snaps0.size).map(snaps0.get(_).get("snapshot-id").asLong).max + 1

    // the delete file: distributed write, moved into data/
    val staging = s"$tableDir/stage_del_v${curVersion + 1}"
    matched.coalesce(1).write.mode("overwrite").parquet(staging)
    val src = Option(new java.io.File(staging).listFiles()).getOrElse(Array.empty)
      .find(_.getName.endsWith(".parquet")).get
    val delPath = new java.io.File(tableDir, s"data/posdel_$seq.parquet")
    java.nio.file.Files.move(src.toPath, delPath.toPath)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(staging))
    val conf = spark.sessionState.newHadoopConf()
    val (delRows, delBytes, _, _) = footerStats(delPath.getAbsolutePath, conf)

    // manifest (content=1 position deletes) + carried-forward list
    val mp = s"$tableDir/metadata/manifest-pd$seq.avro"
    locally {
      val es = IcebergLite.ManifestEntrySchema
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](es))
      w.create(es, new java.io.File(mp))
      val partRec = new GenericData.Record(
        es.getField("data_file").schema.getField("partition").schema)
      partRec.put("part_value", null)
      val dfRec = new GenericData.Record(es.getField("data_file").schema)
      dfRec.put("content", 1)
      dfRec.put("file_path", delPath.getAbsolutePath)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("partition", partRec)
      dfRec.put("record_count", delRows)
      dfRec.put("file_size_in_bytes", delBytes)
      dfRec.put("lower_bounds", null)
      dfRec.put("upper_bounds", null)
      val e = new GenericData.Record(es)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("data_file", dfRec)
      w.append(e)
      w.close()
    }
    val cur = (0 until snaps0.size).map(snaps0.get)
      .find(_.get("snapshot-id").asLong == meta.get("current-snapshot-id").asLong).get
    val prevManifests = IcebergLite.readAvro(cur.get("manifest-list").asText)
    val manifestList = s"$tableDir/metadata/snap-$snapId.avro"
    locally {
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](IcebergLite.ManifestFileSchema))
      w.create(IcebergLite.ManifestFileSchema, new java.io.File(manifestList))
      prevManifests.foreach(w.append)
      val r = new GenericData.Record(IcebergLite.ManifestFileSchema)
      r.put("manifest_path", mp)
      r.put("manifest_length", new java.io.File(mp).length())
      r.put("partition_spec_id", 0)
      r.put("content", 1)
      r.put("sequence_number", seq)
      r.put("min_sequence_number", seq)
      r.put("added_snapshot_id", snapId)
      w.append(r)
      w.close()
    }
    meta.put("last-sequence-number", seq)
    meta.put("current-snapshot-id", snapId)
    val snapNode = meta.withArray[ArrayNode]("snapshots").addObject()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", seq)
    snapNode.put("timestamp-ms", 1700000000000L + seq)
    snapNode.put("manifest-list", manifestList)
    snapNode.putObject("summary").put("operation", "delete")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tableDir, "metadata",
        s"v${curVersion + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    java.nio.file.Files.writeString(hintPath, (curVersion + 1).toString)
    snapId
  }

  /** Exactly-once streaming sink hook: append one micro-batch, stamping
    * its id into the snapshot SUMMARY. foreachBatch delivers
    * at-least-once; a redelivered batch whose id is already on the
    * snapshot log is skipped (returns None), upgrading the sink to
    * exactly-once — the same idempotence trick the connector sinks use,
    * driven off metadata the reader already parses. */
  def appendBatch(spark: SparkSession, tableDir: String, df: DataFrame,
                  batchId: Long, partCol: Option[String] = None): Option[Long] =
    if (committedBatchIds(tableDir).contains(batchId)) None
    else Some(commit(spark, tableDir, df, partCol, upsertKeys = None,
      summaryProps = Map("streaming-batch-id" -> batchId.toString)))

  /** Batch ids already committed via [[appendBatch]] (from the snapshot
    * summaries of the current metadata version). */
  def committedBatchIds(tableDir: String): Set[Long] = {
    val hint = java.nio.file.Paths.get(tableDir, "metadata", "version-hint.text")
    if (!java.nio.file.Files.exists(hint)) Set.empty
    else {
      val v = java.nio.file.Files.readString(hint).trim.toInt
      val meta = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(tableDir, "metadata", s"v$v.metadata.json")))
      val snaps = meta.get("snapshots")
      (0 until snaps.size).flatMap { i =>
        Option(snaps.get(i).get("summary"))
          .flatMap(s => Option(s.get("streaming-batch-id")))
          .map(_.asText.toLong)
      }.toSet
    }
  }

  private def commit(spark: SparkSession, tableDir: String, df: DataFrame,
                     partCol: Option[String], upsertKeys: Option[Seq[String]],
                     summaryProps: Map[String, String] = Map.empty,
                     replaceAll: Boolean = false): Long = {
    val dir = new java.io.File(tableDir)
    new java.io.File(dir, "data").mkdirs()
    new java.io.File(dir, "metadata").mkdirs()

    // ---- current table state (absent on first commit)
    val hintPath = java.nio.file.Paths.get(tableDir, "metadata", "version-hint.text")
    val curVersion: Int =
      if (java.nio.file.Files.exists(hintPath))
        java.nio.file.Files.readString(hintPath).trim.toInt
      else 0
    val curMeta: Option[ObjectNode] =
      if (curVersion == 0) None
      else Some(mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Paths.get(tableDir, "metadata", s"v$curVersion.metadata.json")))
        .asInstanceOf[ObjectNode])
    val lastSeq = curMeta.map(_.get("last-sequence-number").asLong).getOrElse(0L)
    val seq = lastSeq + 1
    val snapId = curMeta.map { m =>
      val snaps = m.get("snapshots")
      (0 until snaps.size).map(snaps.get(_).get("snapshot-id").asLong).max + 1
    }.getOrElse(1000L)

    // ---- distributed data write: one pass; __part duplicates the
    // partition column so data files RETAIN it (identity transform —
    // the reader does not reconstruct partition columns from metadata)
    require(!df.isEmpty, "commit of an empty DataFrame is not allowed")
    val staging = s"$tableDir/stage_v${curVersion + 1}"
    partCol match {
      case Some(p) =>
        df.withColumn("__part", col(p).cast("string"))
          .repartition(col("__part"))
          .write.partitionBy("__part").mode("overwrite").parquet(staging)
      case None =>
        df.write.mode("overwrite").parquet(staging)
    }

    // ---- stage → data/: collect (finalPath, partValue) per file
    val stagedRoot = new java.io.File(staging)
    def parquetsUnder(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty).toSeq.flatMap { f =>
        if (f.isDirectory) parquetsUnder(f)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      }
    val moved: Seq[(String, Option[String])] = parquetsUnder(stagedRoot)
      .sortBy(_.getAbsolutePath)
      .zipWithIndex.map { case (f, j) =>
        val part = f.getParentFile.getName match {
          case n if n.startsWith("__part=") => Some(n.stripPrefix("__part="))
          case _ => None
        }
        val dst = new java.io.File(dir,
          s"data/w${seq}_${part.map(p => s"${p}_").getOrElse("")}$j.parquet")
        java.nio.file.Files.move(f.toPath, dst.toPath)
        (dst.getAbsolutePath, part)
      }
    org.apache.commons.io.FileUtils.deleteQuietly(stagedRoot)
    require(moved.nonEmpty, "append of an empty DataFrame is not a commit")

    // ---- footer stats, the manifest's file-skipping payload
    val conf = spark.sessionState.newHadoopConf()
    val entries = moved.map { case (path, part) =>
      val (rows, bytes, lo, hi) = footerStats(path, conf)
      (path, part, rows, bytes, lo, hi)
    }

    // ---- equality-delete file + its manifest (upsert commits): the
    // incoming keys, written once, distinct — the read side anti-joins
    // them against earlier-sequence data files only
    val deleteManifest: Option[String] = upsertKeys.map { keys =>
      val delStaging = s"$tableDir/stage_del_v${curVersion + 1}"
      df.select(keys.map(col): _*).distinct()
        .coalesce(1).write.mode("overwrite").parquet(delStaging)
      val delSrc = parquetsUnder(new java.io.File(delStaging)).head
      val delPath = new java.io.File(dir, s"data/eqdel_$seq.parquet")
      java.nio.file.Files.move(delSrc.toPath, delPath.toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(delStaging))
      val (delRows, delBytes, _, _) = footerStats(delPath.getAbsolutePath, conf)
      val mp = s"$tableDir/metadata/manifest-d$seq.avro"
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](IcebergLite.ManifestEntrySchema))
      w.create(IcebergLite.ManifestEntrySchema, new java.io.File(mp))
      val es = IcebergLite.ManifestEntrySchema
      val partRec = new GenericData.Record(
        es.getField("data_file").schema.getField("partition").schema)
      partRec.put("part_value", null)
      val dfRec = new GenericData.Record(es.getField("data_file").schema)
      dfRec.put("content", 2) // equality deletes
      dfRec.put("file_path", delPath.getAbsolutePath)
      dfRec.put("file_format", "PARQUET")
      dfRec.put("partition", partRec)
      dfRec.put("record_count", delRows)
      dfRec.put("file_size_in_bytes", delBytes)
      dfRec.put("lower_bounds", null)
      dfRec.put("upper_bounds", null)
      val e = new GenericData.Record(es)
      e.put("status", 1)
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("data_file", dfRec)
      w.append(e)
      w.close()
      mp
    }

    // ---- manifest avro for this commit
    val manifestPath = s"$tableDir/metadata/manifest-w$seq.avro"
    locally {
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](IcebergLite.ManifestEntrySchema))
      w.create(IcebergLite.ManifestEntrySchema, new java.io.File(manifestPath))
      entries.foreach { case (fp, part, rows, bytes, lo, hi) =>
        val es = IcebergLite.ManifestEntrySchema
        val partRec = new GenericData.Record(
          es.getField("data_file").schema.getField("partition").schema)
        partRec.put("part_value", part.orNull)
        val dfRec = new GenericData.Record(es.getField("data_file").schema)
        dfRec.put("content", 0)
        dfRec.put("file_path", fp)
        dfRec.put("file_format", "PARQUET")
        dfRec.put("partition", partRec)
        dfRec.put("record_count", rows)
        dfRec.put("file_size_in_bytes", bytes)
        def toJava(m: Map[String, Long]): java.util.Map[String, java.lang.Long] =
          if (m.isEmpty) null
          else { val jm = new java.util.HashMap[String, java.lang.Long]()
            m.foreach { case (k, v) => jm.put(k, java.lang.Long.valueOf(v)) }; jm }
        dfRec.put("lower_bounds", toJava(lo))
        dfRec.put("upper_bounds", toJava(hi))
        val e = new GenericData.Record(es)
        e.put("status", 1) // ADDED
        e.put("snapshot_id", snapId)
        e.put("sequence_number", seq)
        e.put("data_file", dfRec)
        w.append(e)
      }
      w.close()
    }

    // ---- metadata node (created on first commit) + partition-spec
    // resolution. PARTITION EVOLUTION (spec "Partition Evolution"):
    // each commit's manifest records the spec it was written under; a
    // later commit with a different partition column registers a NEW
    // spec rather than rewriting history, and the reader prunes each
    // file only by its own spec's column (planFiles partPruneBy).
    val meta: ObjectNode = curMeta.getOrElse {
      val m = mapper.createObjectNode()
      m.put("format-version", 2)
      m.put("table-uuid", "00000000-0000-0000-0000-000000000001")
      m.put("location", tableDir)
      m.putArray("partition-specs")
      m.putArray("snapshots")
      m
    }
    val specsArr = meta.withArray[ArrayNode]("partition-specs")
    val wantedField = partCol.getOrElse("")
    val specId: Int = (0 until specsArr.size).map(specsArr.get)
      .find { s =>
        val fs = s.get("fields")
        (if (fs == null || fs.size == 0) "" else fs.get(0).get("name").asText) == wantedField
      }
      .map(_.get("spec-id").asInt)
      .getOrElse {
        val nid = (0 until specsArr.size).map(specsArr.get(_).get("spec-id").asInt)
          .foldLeft(-1)(math.max) + 1
        val spec = specsArr.addObject()
        spec.put("spec-id", nid)
        val fields = spec.putArray("fields")
        partCol.foreach { p =>
          val f = fields.addObject()
          f.put("name", p); f.put("transform", "identity")
          f.put("source-id", 1); f.put("field-id", 1000 + nid)
        }
        nid
      }

    // ---- manifest list: previous snapshot's manifests carried
    // forward + the new one (append semantics)
    val prevManifests: Seq[GenericRecord] = if (replaceAll) Nil
    else curMeta.map { m =>
      val snaps = m.get("snapshots")
      val cur = (0 until snaps.size).map(snaps.get)
        .find(_.get("snapshot-id").asLong == m.get("current-snapshot-id").asLong)
        .getOrElse(throw new IllegalStateException("current snapshot missing"))
      IcebergLite.readAvro(cur.get("manifest-list").asText)
    }.getOrElse(Nil)
    val manifestList = s"$tableDir/metadata/snap-$snapId.avro"
    locally {
      val w = new DataFileWriter(
        new GenericDatumWriter[GenericRecord](IcebergLite.ManifestFileSchema))
      w.create(IcebergLite.ManifestFileSchema, new java.io.File(manifestList))
      prevManifests.foreach(w.append)
      def listEntry(mp: String, content: Int): GenericRecord = {
        val r = new GenericData.Record(IcebergLite.ManifestFileSchema)
        r.put("manifest_path", mp)
        r.put("manifest_length", new java.io.File(mp).length())
        r.put("partition_spec_id", specId)
        r.put("content", content)
        r.put("sequence_number", seq)
        r.put("min_sequence_number", seq)
        r.put("added_snapshot_id", snapId)
        r
      }
      deleteManifest.foreach(mp => w.append(listEntry(mp, 1)))
      w.append(listEntry(manifestPath, 0))
      w.close()
    }

    // ---- new metadata version, then the version-hint swap (the
    // single-writer commit point — written LAST)
    meta.put("last-sequence-number", seq)
    meta.put("current-snapshot-id", snapId)
    val snapNode = meta.withArray[ArrayNode]("snapshots").addObject()
    snapNode.put("snapshot-id", snapId)
    snapNode.put("sequence-number", seq)
    snapNode.put("timestamp-ms", 1700000000000L + seq)
    snapNode.put("manifest-list", manifestList)
    val summaryNode = snapNode.putObject("summary")
    summaryNode.put("operation",
      if (replaceAll) "replace"
      else if (upsertKeys.isDefined) "overwrite" else "append")
    summaryProps.foreach { case (k, v) => summaryNode.put(k, v) }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tableDir, "metadata",
        s"v${curVersion + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    java.nio.file.Files.writeString(hintPath, (curVersion + 1).toString)
    snapId
  }

  /** Snapshot EXPIRY + orphan cleanup (the spec's expire_snapshots /
    * remove_orphan_files maintenance pair): keep the most recent
    * `keepLast` snapshots, rewrite the metadata version without the
    * expired ones, delete their manifest lists, and physically delete
    * every data/delete/manifest file referenced ONLY by expired
    * snapshots. Metadata-sized driver work; the file-reachability set
    * is the union of the kept snapshots' plans. Returns the deleted
    * file paths. At 100 TB this is what keeps a CDC-upserted table from
    * growing without bound. */
  def expireSnapshots(tableDir: String, keepLast: Int): Seq[String] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val hintPath = java.nio.file.Paths.get(tableDir, "metadata", "version-hint.text")
    val curVersion = java.nio.file.Files.readString(hintPath).trim.toInt
    val meta = mapper.readTree(java.nio.file.Files.readString(
      java.nio.file.Paths.get(tableDir, "metadata", s"v$curVersion.metadata.json")))
      .asInstanceOf[ObjectNode]
    val snaps = meta.withArray[ArrayNode]("snapshots")
    val all = (0 until snaps.size).map(snaps.get(_).asInstanceOf[ObjectNode])
      .sortBy(_.get("sequence-number").asLong)
    if (all.size <= keepLast) return Nil
    val (expired, kept) = all.splitAt(all.size - keepLast)

    // reachability: every file (data + manifest) a KEPT snapshot plans
    def filesOf(snapId: Long): (Set[String], Set[String]) = {
      val tasks = IcebergLite.planFiles(tableDir, Some(snapId))
      val snap = all.find(_.get("snapshot-id").asLong == snapId).get
      val manifests = IcebergLite.readAvro(snap.get("manifest-list").asText)
        .map(_.get("manifest_path").toString).toSet
      (tasks.map(_.path).toSet, manifests)
    }
    val keptIds = kept.map(_.get("snapshot-id").asLong)
    val (keptData, keptManifests) = keptIds.map(filesOf)
      .foldLeft((Set.empty[String], Set.empty[String])) {
        case ((d, m), (d2, m2)) => (d ++ d2, m ++ m2)
      }
    val deleted = Seq.newBuilder[String]
    // plan every expired snapshot BEFORE deleting anything — later
    // expired snapshots replay manifests earlier ones also reference
    val expiredSets = expired.map { s =>
      (s.get("manifest-list").asText, filesOf(s.get("snapshot-id").asLong))
    }
    expiredSets.foreach { case (ml, (data, manifests)) =>
      (data -- keptData).foreach { p =>
        if (new java.io.File(p).delete()) deleted += p
      }
      (manifests -- keptManifests).foreach { p =>
        if (new java.io.File(p).delete()) deleted += p
      }
      if (new java.io.File(ml).delete()) deleted += ml
    }
    // rewrite metadata with only the kept snapshots, bump the version
    val newSnaps = mapper.createArrayNode()
    kept.foreach(newSnaps.add)
    meta.set[ObjectNode]("snapshots", newSnaps)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tableDir, "metadata",
        s"v${curVersion + 1}.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(meta))
    java.nio.file.Files.writeString(hintPath, (curVersion + 1).toString)
    deleted.result()
  }

  /** Record count, byte size, and integral-column lower/upper bounds
    * from one parquet footer — metadata-sized, no data read. */
  private[ops] def footerStats(path: String,
                               conf: org.apache.hadoop.conf.Configuration)
      : (Long, Long, Map[String, Long], Map[String, Long]) = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val lo = scala.collection.mutable.Map.empty[String, Long]
      val hi = scala.collection.mutable.Map.empty[String, Long]
      blocks.foreach(_.getColumns.asScala.foreach { c =>
        val name = c.getPath.toDotString
        val stats = c.getStatistics
        val tname = c.getPrimitiveType.getPrimitiveTypeName.name()
        if (stats != null && stats.hasNonNullValue &&
            (tname == "INT64" || tname == "INT32")) {
          val (mn, mx) = stats.genericGetMin match {
            case l: java.lang.Long => (l.longValue, stats.genericGetMax.asInstanceOf[java.lang.Long].longValue)
            case i: java.lang.Integer => (i.longValue, stats.genericGetMax.asInstanceOf[java.lang.Integer].longValue)
            case _ => (0L, 0L)
          }
          lo(name) = lo.get(name).fold(mn)(math.min(_, mn))
          hi(name) = hi.get(name).fold(mx)(math.max(_, mx))
        }
      })
      (rows, new java.io.File(path).length(), lo.toMap, hi.toMap)
    } finally reader.close()
  }
}
