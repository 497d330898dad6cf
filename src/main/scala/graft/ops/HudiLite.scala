package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Apache Hudi COPY-ON-WRITE table read path from the public layout
  * spec (hudi.apache.org/docs — timeline + file groups), no connector
  * jar: the third lakehouse format next to [[IcebergLite]] and
  * [[DeltaLite]] (reference: fe/fe-core/.../datasource/hudi/).
  *
  * The layout: `.hoodie/` holds the TIMELINE — completed commits as
  * `<instantTime>.commit` JSON whose `partitionToWriteStats` lists the
  * base files each commit wrote. Data lives as parquet base files
  * named `<fileId>_<writeToken>_<instantTime>.parquet` inside
  * partition directories. Copy-on-write means an update REWRITES a
  * file group: the snapshot at instant T is, per fileId, the base file
  * with the LATEST instantTime <= T (the "latest file slice").
  *
  * Spark-first mapping: the timeline is metadata-sized and replays on
  * the driver (FE role); file-slice selection and partition-path
  * pruning happen there, before any parquet footer opens; the read is
  * one distributed parquet scan of the chosen slices. Honest scope:
  * COW snapshot + time travel + partition pruning; merge-on-read log
  * files (.log.*), the internal metadata table, and the commit
  * protocol (the writer below is fixture scaffolding) are out of
  * scope and documented here. Correctness is non-circular: the
  * `src_hudi_*` oracles recompute expected content from the base
  * table by predicate. */
object HudiLite {

  private def mapper = new ObjectMapper()

  /** (path, partition, fileId, instantTime) of the latest slice per
    * file group visible at `instant` (default: latest commit). */
  def planFiles(tableDir: String, instant: Option[String] = None,
                partFilter: Option[String => Boolean] = None)
      : Seq[(String, String, String, String)] = {
    val timelineDir = new java.io.File(tableDir, ".hoodie")
    val commits = Option(timelineDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".commit"))
      .map(f => (f.getName.stripSuffix(".commit"), f))
      .sortBy(_._1)
      .filter { case (t, _) => instant.forall(t <= _) }
    require(commits.nonEmpty, s"no completed commits <= $instant in $timelineDir")
    // replay: latest (instant, path) per fileId wins — copy-on-write
    val latest = scala.collection.mutable.LinkedHashMap
      .empty[String, (String, String, String)] // fileId -> (path, part, instant)
    commits.foreach { case (t, f) =>
      val node = mapper.readTree(java.nio.file.Files.readString(f.toPath))
      val p2ws = node.get("partitionToWriteStats")
      val parts = p2ws.fieldNames()
      while (parts.hasNext) {
        val part = parts.next()
        val stats = p2ws.get(part)
        (0 until stats.size).map(stats.get).foreach { st =>
          latest(st.get("fileId").asText) = (st.get("path").asText, part, t)
        }
      }
    }
    latest.toSeq.collect {
      case (fid, (path, part, t)) if partFilter.forall(_(part)) =>
        (s"$tableDir/$path", part, fid, t)
    }
  }

  /** Snapshot (or time-travel) read of the latest file slices. */
  def readSnapshot(spark: SparkSession, tableDir: String,
                   instant: Option[String] = None,
                   partFilter: Option[String => Boolean] = None): DataFrame = {
    val files = planFiles(tableDir, instant, partFilter)
    require(files.nonEmpty, "no live file slices after replay/pruning")
    spark.read.parquet(files.map(_._1): _*)
  }

  // ------------------------------------------------------- writer (fixture)
  /** One commit: per (partition, fileId) the FULL new content of that
    * file group (copy-on-write rewrite; a fileId absent from a commit
    * keeps its previous slice). */
  final case class Commit(instant: String,
                          writes: Seq[(String, String, Seq[Row])])

  /** Stage a layout-shaped COW table (driver staging — test
    * scaffolding): partition dirs of versioned base files + the
    * `.hoodie` timeline. */
  def writeFixtureTable(spark: SparkSession, tableDir: String,
                        schemaDf: DataFrame, commits: Seq[Commit]): Unit = {
    val dir = new java.io.File(tableDir)
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    new java.io.File(dir, ".hoodie").mkdirs()
    commits.foreach { c =>
      val statsJson = c.writes.groupBy(_._1).map { case (part, ws) =>
        new java.io.File(dir, part).mkdirs()
        val entries = ws.map { case (_, fileId, rows) =>
          val rel = s"$part/${fileId}_0-0-0_${c.instant}.parquet"
          val tmp = s"$tableDir/tmp_stage"
          spark.createDataFrame(
              new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)),
              schemaDf.schema)
            .coalesce(1).write.mode("overwrite").parquet(tmp)
          val partFile = new java.io.File(tmp).listFiles()
            .find(_.getName.endsWith(".parquet")).get
          java.nio.file.Files.move(partFile.toPath,
            new java.io.File(dir, rel).toPath)
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
          s"""{"fileId":"$fileId","path":"$rel","numWrites":${rows.size}}"""
        }
        s""""$part":[${entries.mkString(",")}]"""
      }.mkString(",")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(tableDir, ".hoodie", s"${c.instant}.commit"),
        s"""{"partitionToWriteStats":{$statsJson}}""")
    }
  }
}
