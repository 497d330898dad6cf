package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** streaming/CdfSource.scala — the change feeds as Structured
  * Streaming sources. The Delta/Paimon spellings are oracle-gated
  * (`stream_{delta,paimon}_cdf_source`); this spec pins the Iceberg
  * and Hudi variants plus the offset-resume contract at unit scale. */
class CdfSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def runOnce(tableDir: String, fmt: String, ckpt: String,
                      out: String, extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft.streaming.CdfSourceProvider")
      .option("path", tableDir).option("format", fmt)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def fresh(n: String): String = {
    // the ops writers expect ABSOLUTE table dirs (the _metadata
    // file_path joins key on absolute paths)
    val p = new java.io.File(s"target/stream/cdfspec_$n").getAbsolutePath
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  test("iceberg incremental skips REPLACE snapshots: state motion is not change") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    val dir = fresh("ice_repl")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    IcebergWriter.rewriteDataFiles(spark, dir, Some("p")): Unit
    val s3 = IcebergWriter.append(spark, dir, Seq((3L, "A")).toDF("k", "p"),
      Some("p"))
    // the rewrite's fresh copies of k=1,2 must NOT ship as appends
    val inc = IcebergLite.readIncremental(spark, dir, s1, s3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(inc == Set(3L),
      s"a REPLACE snapshot's files are state motion, not change: $inc")
  }

  test("iceberg CDC feed: overwrite ships deletes+inserts, truncate ships deletes, rewrite skipped") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    val dir = fresh("ice_cdc_ops")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    // INSERT OVERWRITE: a DATA change — old rows ship as deletes, new as inserts
    val s2v = IcebergWriter.overwrite(spark, dir,
      Seq((3L, "A"), (4L, "B")).toDF("k", "p"), Some("p"))
    val w1 = IcebergLite.readChangesCdc(spark, dir, s1, s2v)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w1 == Set((1L, "delete"), (2L, "delete"),
      (3L, "insert"), (4L, "insert")), s"overwrite window: $w1")
    // rewrite_data_files: STATE MOTION — the CDC feed ships nothing
    IcebergWriter.rewriteDataFiles(spark, dir, Some("p")): Unit
    val s3 = IcebergWriter.append(spark, dir, Seq((5L, "A")).toDF("k", "p"),
      Some("p"))
    val w2 = IcebergLite.readChangesCdc(spark, dir, s2v, s3)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w2 == Set((5L, "insert")),
      s"a rewrite's file churn must not ship as change: $w2")
    // TRUNCATE: every live row ships as a delete
    val s4 = IcebergWriter.truncateTable(spark, dir)
    val w3 = IcebergLite.readChangesCdc(spark, dir, s3, s4)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w3 == Set((3L, "delete"), (4L, "delete"), (5L, "delete")),
      s"truncate window: $w3")
    // deletes respect the PREDECESSOR's row-level state: a position-
    // deleted row ships ONCE from its own DML window (r15: row-level
    // deletes ride the feed) and must NOT re-ship in the later
    // truncate window
    val s5 = IcebergWriter.append(spark, dir,
      Seq((6L, "A"), (7L, "A")).toDF("k", "p"), Some("p"))
    IcebergWriter.deleteRows(spark, dir, $"k" === 6L): Unit
    val s7 = IcebergWriter.truncateTable(spark, dir)
    val w4rows = IcebergLite.readChangesCdc(spark, dir, s5, s7)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(w4rows.sorted == Seq((6L, "delete"), (7L, "delete")),
      "the DML window ships k=6 once; the truncate window ships only " +
        s"the still-live k=7 — no resurrection, no double delete: $w4rows")
  }

  test("iceberg CDC feed: row-level DML ships per-row deletes (position + equality)") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    // POSITION deletes: a keyless DELETE window must be non-empty
    val dir = fresh("ice_cdc_rowdel")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B"), (3L, "A")).toDF("k", "p"), Some("p"))
    val s2id = IcebergWriter.deleteRows(spark, dir, $"k" === 2L)
    val w1 = IcebergLite.readChangesCdc(spark, dir, s1, s2id)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w1 == Set((2L, "delete")),
      s"a position-delete commit must ship its masked rows as deletes: $w1")
    // an already-deleted row must not re-ship in a LATER window
    val s3 = IcebergWriter.deleteRows(spark, dir, $"k" === 3L)
    val w2 = IcebergLite.readChangesCdc(spark, dir, s2id, s3)
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w2 == Set((3L, "delete")),
      s"only THIS window's masked rows ride, not the predecessor's: $w2")
    // EQUALITY deletes: a PK upsert window ships delete+insert pairs
    // for replaced keys and insert-only for fresh ones
    val dir2 = fresh("ice_cdc_equps")
    val u1 = IcebergWriter.append(spark, dir2,
      Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v"), Some("p"))
    val u2 = IcebergWriter.upsert(spark, dir2,
      Seq((1L, "A", 11), (9L, "B", 90)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = Some("p"))
    val w3 = IcebergLite.readChangesCdc(spark, dir2, u1, u2)
      .select("k", "v", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(w3 == Set((1L, 10, "delete"), (1L, 11, "insert"),
      (9L, 90, "insert")),
      s"an upsert is delete(pre-image)+insert on the feed: $w3")
  }

  test("iceberg CDC feed: schema drift inside a window null-fills, not throws") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{IcebergLite, IcebergWriter}
    val dir = fresh("ice_cdc_drift")
    val s1 = IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    // the overwrite's files carry a WIDER schema than the removed ones:
    // the delete frame (predecessor schema) and insert frame (current)
    // must union with null-fill, not throw on the missing column
    val s2v = IcebergWriter.overwrite(spark, dir,
      Seq((3L, "A", 30)).toDF("k", "p", "v"), Some("p"))
    val w = IcebergLite.readChangesCdc(spark, dir, s1, s2v)
    val got = w.select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "delete"), (2L, "delete"), (3L, "insert")),
      s"drift window: $got")
    assert(w.filter($"_CHANGE_TYPE" === "delete")
      .select("v").collect().forall(_.isNullAt(0)),
      "pre-evolution delete rows null-fill the added column")
  }

  test("iceberg CDC feed across a RENAME ships uniform CURRENT names") {
    import graft.ops.IcebergLite
    spark.sql("CREATE OR REPLACE TABLE graft_iceberg.cdc_rn " +
      "(k BIGINT, p STRING, v INT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO graft_iceberg.cdc_rn SELECT * FROM VALUES " +
      "(1L,'A',10),(2L,'A',20),(3L,'B',30) t(k,p,v)")
    val dir = new java.io.File("target/lakehouse/iceberg/cdc_rn")
      .getAbsolutePath
    val s1 = IcebergLite.currentSnapshotIdOf(dir)
    spark.sql("DELETE FROM graft_iceberg.cdc_rn WHERE k = 1") // pre-rename
    spark.sql("ALTER TABLE graft_iceberg.cdc_rn RENAME COLUMN v TO w")
    spark.sql("DELETE FROM graft_iceberg.cdc_rn WHERE k = 2") // post-rename
    val s3 = IcebergLite.currentSnapshotIdOf(dir)
    val win = IcebergLite.readChangesCdc(spark, dir, s1, s3)
    // every frame of the window — including delete frames read under
    // predecessor (pre-rename) schemas — speaks the CURRENT name
    assert(win.columns.contains("w") && !win.columns.contains("v"),
      s"window columns must align to current names: ${win.columns.toSeq}")
    val got = win.select("k", "w", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set((1L, 10, "delete"), (2L, 20, "delete")),
      s"rename-spanning window: $got")
  }

  test("hudi feed across a lazy file-group creation: fresh bases ship as inserts") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.HudiLite
    val dir = fresh("hudi_lazy")
    HudiLite.createTable(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "001")
    // one deltacommit carrying BOTH a log (existing partition) and a
    // fresh base group (never-seen partition)
    HudiLite.upsert(spark, dir,
      Seq((2L, "A", 200), (9L, "Z", 90)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "002")
    val w = HudiLite.readIncrementalMor(spark, dir, "001", "002")
      .select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w == Set((2L, "upsert"), (9L, "insert")),
      s"fresh-partition bases must ride as inserts, logs as upserts: $w")
  }

  test("hudi feed rides replace instants: retype quiet, truncates ship deletes") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.HudiLite
    val dir = fresh("hudi_replace")
    HudiLite.createTable(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "001")
    HudiLite.upsert(spark, dir, Seq((2L, "A", 21)).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "002")
    // a RETYPE replacecommit: state motion — the window is QUIET about
    // the rewrite but still carries the 002 upsert, under CURRENT types
    HudiLite.retypeColumn(spark, dir, "v", "string",
      keyCols = Seq("k"), partCol = "p", instant = "003")
    val w1 = HudiLite.readIncrementalMor(spark, dir, "001", "003", Seq("k"))
    assert(w1.schema("v").dataType ==
      org.apache.spark.sql.types.StringType,
      s"frames align to the current (retyped) type: ${w1.schema}")
    val g1 = w1.select("k", "v", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(g1 == Set((2L, "21", "upsert")),
      s"retype must be feed-quiet, pre-retype frames cast: $g1")
    // TRUNCATE PARTITION ships the dropped partition's then-live rows
    // as deletes (the iceberg removed-file discipline)
    HudiLite.truncatePartition(dir, "A", "004")
    val w2 = HudiLite.readIncrementalMor(spark, dir, "003", "004", Seq("k"))
    val g2 = w2.select("k", "v", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(g2 == Set((1L, "10", "delete"), (2L, "21", "delete")),
      s"truncate-partition window must ship then-live rows as deletes: $g2")
    // INSERT OVERWRITE ships then-live rows as deletes + fresh inserts
    HudiLite.overwriteTable(spark, dir,
      Seq((7L, "B", "70")).toDF("k", "p", "v"),
      keyCols = Seq("k"), partCol = "p", instant = "005")
    val w3 = HudiLite.readIncrementalMor(spark, dir, "004", "005", Seq("k"))
    val g3 = w3.select("k", "_CHANGE_TYPE").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g3 == Set((3L, "delete"), (7L, "insert")),
      s"overwrite window = predecessor deletes + fresh inserts: $g3")
    // replica premise: fold the WHOLE feed by key — latest change per
    // key wins — and compare to the final table
    val feed = HudiLite.readIncrementalMor(spark, dir, "000", "005", Seq("k"))
    assert(feed.columns.toSeq ==
      HudiLite.readSnapshotMor(spark, dir, Seq("k")).columns.toSeq :+
        "_CHANGE_TYPE")
    // a window with a non-retype replace and NO keyCols refuses loudly
    val e = intercept[Exception] {
      HudiLite.readIncrementalMor(spark, dir, "003", "005").collect()
    }
    assert(e.getMessage.contains("needs keyCols"), e.getMessage)
  }

  test("iceberg incremental source: initial snapshot, appends-only windows, resume") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.IcebergWriter
    val (dir, ckpt, out) = (fresh("ice_t"), fresh("ice_c"), fresh("ice_o"))
    IcebergWriter.append(spark, dir,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), Some("p"))
    runOnce(dir, "iceberg", ckpt, out)
    IcebergWriter.append(spark, dir, Seq((3L, "A")).toDF("k", "p"), Some("p"))
    IcebergWriter.append(spark, dir, Seq((4L, "B")).toDF("k", "p"), Some("p"))
    runOnce(dir, "iceberg", ckpt, out)
    val events = spark.read.parquet(out)
    assert(events.groupBy($"k", $"_CHANGE_TYPE").count()
      .filter($"count" > 1).count() == 0, "resume must not replay windows")
    assert(events.select("k").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(events.select("_CHANGE_TYPE").distinct().collect()
      .map(_.getString(0)).toSet == Set("insert"))
  }

  test("hudi incremental source: upsert/delete windows ride _CHANGE_TYPE, resume") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.HudiLite
    val (dir, ckpt, out) = (fresh("hudi_t"), fresh("hudi_c"), fresh("hudi_o"))
    HudiLite.createTable(spark, dir,
      Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v"),
      Seq("k"), "p", "001")
    runOnce(dir, "hudi", ckpt, out, Map("keycols" -> "k"))
    HudiLite.upsert(spark, dir, Seq((2L, "A", 200)).toDF("k", "p", "v"),
      Seq("k"), "p", "002"): Unit
    HudiLite.deleteKeys(spark, dir, Seq(3L).toDF("k"), Seq("k"), "003")
    runOnce(dir, "hudi", ckpt, out, Map("keycols" -> "k"))
    val events = spark.read.parquet(out)
    assert(events.groupBy($"k", $"_CHANGE_TYPE").count()
      .filter($"count" > 1).count() == 0, "resume must not replay windows")
    val byType = events.groupBy("_CHANGE_TYPE")
      .agg(collect_set($"k").as("ks")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert(byType("insert") == Set(1L, 2L, 3L))
    assert(byType("upsert") == Set(2L))
    assert(byType("delete") == Set(3L))
  }

  test("CDC windows spanning a DROP COLUMN speak the CURRENT schema ×4") {
    // pre-drop frames (read under their own snapshot's schema) must
    // not carry the dead column into the union: the window's schema is
    // the current table schema + _CHANGE_TYPE on every format (ADD
    // null-fills, DROP drops), and a key-folded replica still lands on
    // the final table
    for (fmt <- Seq("delta", "iceberg", "paimon", "hudi")) {
      val pk = fmt match {
        case "paimon" => "PRIMARY KEY (p, k) "
        case "hudi" => "PRIMARY KEY (k) "
        case _ => ""
      }
      spark.sql(s"CREATE OR REPLACE TABLE graft_$fmt.cdc_drop " +
        s"(k BIGINT, p STRING, v INT, w INT) $pk PARTITIONED BY (p)")
      spark.sql(s"INSERT INTO graft_$fmt.cdc_drop SELECT * FROM VALUES " +
        "(1L,'A',10,100),(2L,'A',20,200),(3L,'A',30,300) t(k,p,v,w)")
      val dir = new java.io.File(s"target/lakehouse/$fmt/cdc_drop")
        .getAbsolutePath
      val c0 = graft.streaming.CdfFeed.coordinate(spark, fmt, dir)
      // pre-drop change: the deleted row's frame resolves a schema
      // that still holds w
      spark.sql(s"DELETE FROM graft_$fmt.cdc_drop WHERE k = 1")
      spark.sql(s"ALTER TABLE graft_$fmt.cdc_drop DROP COLUMN w")
      spark.sql(s"INSERT INTO graft_$fmt.cdc_drop " +
        "SELECT 9 AS k, 'A' AS p, 90 AS v")
      val c1 = graft.streaming.CdfFeed.coordinate(spark, fmt, dir)
      val keyCols = if (fmt == "hudi") Seq("k") else Nil
      val win = graft.streaming.CdfFeed.changes(spark, fmt, dir,
        Some(c0), c1, keyCols)
      assert(win.columns.toSet == Set("k", "p", "v", "_CHANGE_TYPE"),
        s"$fmt window spanning a DROP must speak the current schema, " +
          s"got ${win.columns.toSeq}")
      val rows = win.select("k", "_CHANGE_TYPE").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.contains((1L, "delete")),
        s"$fmt: the pre-drop delete must ride the window: ${rows.toSeq}")
      // key-folded replica over the pre-window state equals the table
      val base = scala.collection.mutable.Map(
        1L -> (("A", 10)), 2L -> (("A", 20)), 3L -> (("A", 30)))
      win.select("k", "p", "v", "_CHANGE_TYPE").collect()
        .sortBy(_.getString(3)) // deletes fold before inserts/upserts
        .foreach { r =>
          if (r.getString(3) == "delete") base.remove(r.getLong(0)): Unit
          else base(r.getLong(0)) = (r.getString(1), r.getInt(2))
        }
      val fin = spark.sql(s"SELECT k, p, v FROM graft_$fmt.cdc_drop")
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2))))
        .toMap
      assert(base.toMap == fin,
        s"$fmt: replica after the DROP-spanning window diverged: " +
          s"$base vs $fin")
    }
  }
}
