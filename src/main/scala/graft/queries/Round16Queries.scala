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
      ORDER BY _CHANGE_TYPE"""
  )
}
