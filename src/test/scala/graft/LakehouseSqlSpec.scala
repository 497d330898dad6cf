package graft

import org.scalatest.funsuite.AnyFunSuite

/** plans/LakehouseSql.scala — the graft_<fmt> SQL catalog route: the
  * happy paths are oracle-checked (`sql_lake_*`); this spec pins the
  * ERROR contract (loud, never silent) and the travel/read semantics
  * at unit scale. */
class LakehouseSqlSpec extends AnyFunSuite {
  import TestSpark._

  private def sql(s: String) = spark.sql(s)

  test("create + insert + delete + select round trip (iceberg)") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "B"))
      .toDF("k", "p").createOrReplaceTempView("lksql_src")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_t1 " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_src")
    sql("INSERT INTO graft_iceberg.lksql_t1 SELECT 5 AS k, 'A' AS p")
    sql("DELETE FROM graft_iceberg.lksql_t1 WHERE k % 2 = 0")
    val got = sql("SELECT k FROM graft_iceberg.lksql_t1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L, 5L))
    // versioned read: snapshot 1000 is the CREATE state
    assert(sql("SELECT count(*) AS n FROM graft_iceberg.lksql_t1 " +
      "FOR VERSION AS OF 1000").head().getLong(0) == 4L)
  }

  test("CREATE without OR REPLACE on an existing table is loud") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_src2")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_t2 " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_src2")
    val e = intercept[Exception] {
      sql("CREATE TABLE graft_delta.lksql_t2 " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_src2")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("reads and writes against an unknown table are loud") {
    intercept[Exception] {
      sql("SELECT * FROM graft_iceberg.lksql_nope").collect()
    }
    intercept[Exception] {
      sql("INSERT INTO graft_paimon.lksql_nope SELECT 1 AS k")
    }
  }

  test("append-only paimon refuses DELETE; hudi without PK refuses CREATE") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_src3")
    // no PRIMARY KEY -> append-only paimon table
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_ao " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_src3")
    // duplicates survive on append-only
    sql("INSERT INTO graft_paimon.lksql_ao SELECT * FROM lksql_src3")
    assert(sql("SELECT count(*) AS n FROM graft_paimon.lksql_ao")
      .head().getLong(0) == 2L)
    val e = intercept[Exception] {
      sql("DELETE FROM graft_paimon.lksql_ao WHERE k = 1")
    }
    assert(e.getMessage.contains("append-only"))
    intercept[Exception] {
      sql("CREATE OR REPLACE TABLE graft_hudi.lksql_nopk " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_src3")
    }
  }

  test("delta travel + paimon PK upsert through SQL") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_src4")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_tt " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_src4")
    sql("INSERT INTO graft_delta.lksql_tt SELECT 3 AS k, 'A' AS p, 30 AS v")
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_tt " +
      "FOR VERSION AS OF 0").head().getLong(0) == 2L)
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_tt")
      .head().getLong(0) == 3L)
    // paimon PK: the re-inserted key upserts, not duplicates
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_pk " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM lksql_src4")
    sql("INSERT INTO graft_paimon.lksql_pk SELECT 1 AS k, 'A' AS p, 99 AS v")
    val rows = sql("SELECT k, v FROM graft_paimon.lksql_pk ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(rows == Seq((1L, 99), (2L, 20)))
    // iceberg PK: INSERT upserts via equality deletes, same contract
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_pk " +
      "PRIMARY KEY (k) PARTITIONED BY (p) AS SELECT * FROM lksql_src4")
    sql("INSERT INTO graft_iceberg.lksql_pk SELECT 1 AS k, 'A' AS p, 77 AS v")
    val irows = sql("SELECT k, v FROM graft_iceberg.lksql_pk ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(irows == Seq((1L, 77), (2L, 20)))
    // delta with PRIMARY KEY is a loud scope error at CREATE, not a
    // table that silently appends duplicates
    intercept[Exception] {
      sql("CREATE OR REPLACE TABLE graft_delta.lksql_pk " +
        "PRIMARY KEY (k) PARTITIONED BY (p) AS SELECT * FROM lksql_src4")
    }
  }

  test("WHERE partition conjuncts prune FILE planning on all four formats") {
    val s2 = spark
    import s2.implicits._
    import graft.plans.LakehouseSql
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30), (4L, "D", 40),
        (5L, "A", 50), (6L, "B", 60))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_prune_src")
    def check(fmt: String, ddlExtra: String): Unit = {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_pr $ddlExtra " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_prune_src")
      val got = sql(s"SELECT k FROM graft_$fmt.lksql_pr WHERE p = 'A' ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 5L), s"$fmt values")
      val scan = LakehouseSql.lastScans.find(_.fmt == fmt)
        .getOrElse(fail(s"$fmt read must record a pruned scan"))
      assert(scan.plannedFiles < scan.totalFiles && scan.plannedFiles >= 1,
        s"$fmt must plan a strict file subset: $scan")
    }
    check("iceberg", "")
    check("delta", "")
    check("hudi", "PRIMARY KEY (k)")
    check("paimon", "PRIMARY KEY (p, k)")
    // IN-list prune
    sql("SELECT k FROM graft_iceberg.lksql_pr WHERE p IN ('A','B')").collect()
    val s = graft.plans.LakehouseSql.lastScans.head
    assert(s.plannedFiles == 2 && s.totalFiles == 4, s"IN prune: $s")
  }

  test("single-column OR prunes; unprovable OR shapes read unpruned") {
    import graft.plans.LakehouseSql
    // a same-column disjunction of equalities IS an IN: it prunes
    val got = sql("SELECT k FROM graft_iceberg.lksql_pr " +
      "WHERE p = 'A' OR p = 'B' ORDER BY k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 5L, 6L))
    val s = LakehouseSql.lastScans.headOption.getOrElse(
      fail("same-column OR must record a prune"))
    assert(s.plannedFiles == 2 && s.totalFiles == 4, s"OR prune: $s")
    // a MIXED-column OR proves nothing: unpruned but value-correct
    val got2 = sql("SELECT k FROM graft_iceberg.lksql_pr " +
      "WHERE p = 'A' OR k = 2 ORDER BY k").collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(1L, 2L, 5L))
    assert(LakehouseSql.lastScans.isEmpty, "mixed-column OR must not prune")
    // a parenthesized same-column disjunction INSIDE an AND chain
    // composes with the other conjuncts
    val got3 = sql("SELECT k FROM graft_iceberg.lksql_pr " +
      "WHERE (p = 'A' OR p = 'B') AND k >= 2 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(got3 == Seq(2L, 5L, 6L))
    val s3 = LakehouseSql.lastScans.headOption.getOrElse(
      fail("parenthesized OR conjunct must record a prune"))
    assert(s3.plannedFiles == 2 && s3.totalFiles == 4, s"OR-in-AND prune: $s3")
  }

  test("a predicate matching no partition returns empty, never throws") {
    import graft.plans.LakehouseSql
    // the reader's no-live-files guard is for broken tables, not valid
    // queries over absent partitions (every format)
    for (fmt <- Seq("iceberg", "delta", "hudi", "paimon")) {
      val out = sql(s"SELECT k, p, v FROM graft_$fmt.lksql_pr WHERE p = 'Z'")
      assert(out.collect().isEmpty, s"$fmt absent-partition read")
      assert(out.columns.toSeq == Seq("k", "p", "v"), s"$fmt schema survives")
      val s = LakehouseSql.lastScans.find(_.fmt == fmt).getOrElse(
        fail(s"$fmt zero-match read must record the pruned scan"))
      assert(s.plannedFiles == 0, s"$fmt planned: $s")
    }
  }

  test("UPDATE: native row-change spelling per format") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_upd_src")
    def check(fmt: String, pk: String): Unit = {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_upd $pk " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_upd_src")
      sql(s"UPDATE graft_$fmt.lksql_upd SET v = v * 100 WHERE k >= 2")
      val got = sql(s"SELECT k, v FROM graft_$fmt.lksql_upd ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(got == Seq((1L, 10), (2L, 2000), (3L, 3000)), s"$fmt update")
    }
    check("iceberg", "")
    check("delta", "")
    check("iceberg", "PRIMARY KEY (k)")
    check("hudi", "PRIMARY KEY (k)")
    check("paimon", "PRIMARY KEY (p, k)")
    // assigning a PRIMARY KEY column is loud
    val e = intercept[Exception] {
      sql("UPDATE graft_paimon.lksql_upd SET k = k + 1 WHERE v = 10")
    }
    assert(e.getMessage.contains("PRIMARY KEY"))
    // zero-match UPDATE is a successful NO-OP (standard SQL): the
    // statement resolves, the table is byte-identical
    val before = sql("SELECT k, v FROM graft_delta.lksql_upd ORDER BY k")
      .collect().toSeq
    sql("UPDATE graft_delta.lksql_upd SET v = 0 WHERE k = 999").collect()
    val after = sql("SELECT k, v FROM graft_delta.lksql_upd ORDER BY k")
      .collect().toSeq
    assert(before == after, "zero-match UPDATE must not change the table")
  }

  test("positional UPDATE/MERGE is ONE atomic commit; crash loses nothing") {
    val s2 = spark
    import s2.implicits._
    import graft.ops.{DeltaLite, DeltaWriter, IcebergLite}
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_atom_src")
    def deltaVersion(name: String): Long = {
      val dir = new java.io.File(s"target/lakehouse/delta/$name/_delta_log")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("\\d{20}\\.json"))
        .map(_.getName.dropRight(5).toLong).max
    }
    def icebergVersion(name: String): Int = {
      val dir = new java.io.File(s"target/lakehouse/iceberg/$name/metadata")
      Option(dir.listFiles()).getOrElse(Array.empty)
        .flatMap(f => "^v(\\d+)\\.metadata\\.json$".r
          .findFirstMatchIn(f.getName).map(_.group(1).toInt)).max
    }
    // UPDATE: exactly ONE new version per statement, both formats
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_atom " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_atom_src")
    val dv0 = deltaVersion("lksql_atom")
    sql("UPDATE graft_delta.lksql_atom SET v = v * 100 WHERE k >= 2")
    assert(deltaVersion("lksql_atom") == dv0 + 1,
      "delta UPDATE must commit exactly one version")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_atom " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_atom_src")
    val iv0 = icebergVersion("lksql_atom")
    sql("UPDATE graft_iceberg.lksql_atom SET v = v * 100 WHERE k >= 2")
    assert(icebergVersion("lksql_atom") == iv0 + 1,
      "iceberg UPDATE must commit exactly one metadata version")
    // MERGE with matched update + not-matched insert: one version
    Seq((2L, "B", 9), (9L, "A", 90)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_atom_merge_src")
    val dv1 = deltaVersion("lksql_atom")
    sql("MERGE INTO graft_delta.lksql_atom t USING lksql_atom_merge_src s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(deltaVersion("lksql_atom") == dv1 + 1,
      "delta MERGE must commit exactly one version")
    val got = sql("SELECT k, v FROM graft_delta.lksql_atom ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 10), (2L, 9), (3L, 3000), (9L, 90)))
    // crash-window drill: a SET expression that THROWS mid-statement.
    // The two-commit spelling this replaced committed its delete half
    // first, so this exact failure lost the matched rows; with one
    // atomic commit the statement is all-or-nothing.
    val dir = new java.io.File("target/lakehouse/delta/lksql_atom")
      .getAbsolutePath
    val before = sql("SELECT k, v FROM graft_delta.lksql_atom ORDER BY k")
      .collect().toSeq
    val dvBefore = deltaVersion("lksql_atom")
    spark.udf.register("lksql_boom", (_: Int) =>
      { throw new RuntimeException("injected mid-statement crash"); 0 })
    intercept[Exception] {
      sql("UPDATE graft_delta.lksql_atom SET v = lksql_boom(v) WHERE k >= 1")
    }
    assert(deltaVersion("lksql_atom") == dvBefore,
      "a crashed UPDATE must commit nothing")
    val after = sql("SELECT k, v FROM graft_delta.lksql_atom ORDER BY k")
      .collect().toSeq
    assert(before == after,
      "a crashed UPDATE must leave the table at its pre-statement state")
    // and the read path still replays: deletes + adds were never split
    assert(DeltaLite.readVersion(spark, dir).count() == 4L)
    IcebergLite.planFiles(
      new java.io.File("target/lakehouse/iceberg/lksql_atom").getAbsolutePath)
      : Unit
  }

  test("keyless MERGE cardinality violation is loud (positional formats)") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_card_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_card " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_card_src")
    // two source rows hit target row k=1: standard MERGE requires an
    // error, not one-delete-two-appends
    Seq((1L, "A", 7), (1L, "A", 8)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_card_dup")
    val e = intercept[Exception] {
      sql("MERGE INTO graft_delta.lksql_card t USING lksql_card_dup s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(e.getMessage.contains("cardinality"), s"got: ${e.getMessage}")
    // zero-match MERGE is a successful no-op
    Seq((99L, "A", 1)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_card_none")
    val before = sql("SELECT k, v FROM graft_delta.lksql_card ORDER BY k")
      .collect().toSeq
    sql("MERGE INTO graft_delta.lksql_card t USING lksql_card_none s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v").collect()
    assert(sql("SELECT k, v FROM graft_delta.lksql_card ORDER BY k")
      .collect().toSeq == before, "zero-match MERGE must not change the table")
  }

  test("MERGE INTO: matched update + not-matched insert, all four formats") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mrg_tgt")
    Seq((2L, "B", 999), (9L, "A", 90)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mrg_src")
    def check(fmt: String, pk: String): Unit = {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_mrg $pk " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_mrg_tgt")
      sql(s"MERGE INTO graft_$fmt.lksql_mrg t USING lksql_mrg_src s " +
        "ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT *")
      val got = sql(s"SELECT k, v FROM graft_$fmt.lksql_mrg ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(got == Seq((1L, 10), (2L, 999), (3L, 30), (9L, 90)), s"$fmt merge")
    }
    check("iceberg", "")
    check("delta", "")
    check("iceberg", "PRIMARY KEY (k)")
    check("hudi", "PRIMARY KEY (k)")
    check("paimon", "PRIMARY KEY (p, k)")
  }

  test("MERGE WHEN MATCHED THEN DELETE; cardinality violation is loud") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mrg_tgt2")
    Seq((2L, "B", 0), (9L, "A", 90)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mrg_src2")
    def check(fmt: String, pk: String): Unit = {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_mrgd $pk " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_mrg_tgt2")
      sql(s"MERGE INTO graft_$fmt.lksql_mrgd t USING lksql_mrg_src2 s " +
        "ON t.k = s.k WHEN MATCHED THEN DELETE " +
        "WHEN NOT MATCHED THEN INSERT *")
      val got = sql(s"SELECT k FROM graft_$fmt.lksql_mrgd ORDER BY k")
        .collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L, 3L, 9L), s"$fmt merge-delete")
    }
    check("delta", "")
    check("hudi", "PRIMARY KEY (k)")
    check("paimon", "PRIMARY KEY (p, k)")
    // a source with two rows per key violates MERGE cardinality (PK)
    Seq((2L, "B", 1), (2L, "B", 2)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mrg_dup")
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_card " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM lksql_mrg_tgt2")
    val e = intercept[Exception] {
      sql("MERGE INTO graft_paimon.lksql_card t USING lksql_mrg_dup s " +
        "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")
    }
    assert(e.getMessage.contains("cardinality"))
  }

  test("table streams: per-stream cursors, empty-after-consume, loud unknowns") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A"), (2L, "B")).toDF("k", "p")
      .createOrReplaceTempView("lksql_ts_src")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_ts " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_ts_src")
    val wh = spark.conf.getOption("spark.graft.lakehouse.dir")
      .getOrElse("target/lakehouse")
    Seq("sa", "sb").foreach(n => java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$wh/_streams/lksql_$n.json")): Unit)
    sql("CREATE STREAM graft_stream.lksql_sa ON TABLE graft_iceberg.lksql_ts")
    sql("INSERT INTO graft_iceberg.lksql_ts SELECT 3 AS k, 'A' AS p")
    // a second stream created AFTER the insert starts at the new head
    sql("CREATE STREAM graft_stream.lksql_sb ON TABLE graft_iceberg.lksql_ts")
    assert(sql("SELECT k FROM graft_stream.lksql_sa")
      .collect().map(_.getLong(0)).toSeq == Seq(3L),
      "stream a ships the post-creation window")
    assert(sql("SELECT k FROM graft_stream.lksql_sb").count() == 0,
      "stream b's cursor started after the insert")
    assert(sql("SELECT k FROM graft_stream.lksql_sa").count() == 0,
      "consumed stream is empty until new commits")
    val e = intercept[Exception] {
      sql("CREATE STREAM graft_stream.lksql_sa ON TABLE graft_iceberg.lksql_ts")
    }
    assert(e.getMessage.contains("already exists"))
    intercept[Exception] {
      sql("SELECT * FROM graft_stream.lksql_nope").collect()
    }
  }

  test("INSERT OVERWRITE: atomic on delta/iceberg, loud on LSM/MoR; ts travel") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_ow_src")
    Seq((9L, "A", 90)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_ow_new")
    Seq("delta", "iceberg").foreach { fmt =>
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_ow " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
      sql(s"INSERT OVERWRITE graft_$fmt.lksql_ow SELECT * FROM lksql_ow_new")
      assert(sql(s"SELECT k FROM graft_$fmt.lksql_ow")
        .collect().map(_.getLong(0)).toSeq == Seq(9L), s"$fmt overwrite")
    }
    // paimon: ONE commitKind=OVERWRITE snapshot (no base manifests);
    // the pre-overwrite snapshot still time-travels
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_ow " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
    sql("INSERT OVERWRITE graft_paimon.lksql_ow SELECT * FROM lksql_ow_new")
    assert(sql("SELECT k FROM graft_paimon.lksql_ow ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(9L), "paimon overwrite")
    assert(sql("SELECT count(*) AS n FROM graft_paimon.lksql_ow " +
      "FOR VERSION AS OF 1").head().getLong(0) == 2L,
      "pre-overwrite paimon snapshot still time-travels")
    // hudi: ONE replacecommit instant supersedes every file group
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_ow " +
      "PRIMARY KEY (k) PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
    sql("INSERT OVERWRITE graft_hudi.lksql_ow SELECT * FROM lksql_ow_new")
    assert(sql("SELECT k FROM graft_hudi.lksql_ow ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(9L), "hudi overwrite")
    assert(sql("SELECT count(*) AS n FROM graft_hudi.lksql_ow " +
      "FOR VERSION AS OF 1").head().getLong(0) == 2L,
      "pre-overwrite hudi instant still time-travels")
    // timestamp travel: delta v0 stamp resolves; hudi maps the stamp to
    // its first instant (001 → 1700000000001), earlier is loud
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_ow " +
      "FOR TIMESTAMP AS OF 1700000000000").head().getLong(0) == 2L)
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_owh " +
      "PRIMARY KEY (k) PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
    assert(sql("SELECT count(*) AS n FROM graft_hudi.lksql_owh " +
      "FOR TIMESTAMP AS OF 1700000000001").head().getLong(0) == 2L)
    val e2 = intercept[Exception] {
      sql("SELECT * FROM graft_hudi.lksql_owh " +
        "FOR TIMESTAMP AS OF 1700000000000").collect()
    }
    assert(e2.getMessage.contains("no hudi instant"))
  }

  test("DROP TABLE / DROP STREAM: gone means gone, unknowns are loud") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_drop_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_drop " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_drop_src")
    val wh = spark.conf.getOption("spark.graft.lakehouse.dir")
      .getOrElse("target/lakehouse")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$wh/_streams/lksql_ds.json")): Unit
    sql("CREATE STREAM graft_stream.lksql_ds ON TABLE graft_delta.lksql_drop")
    sql("DROP STREAM graft_stream.lksql_ds")
    intercept[Exception] { sql("SELECT * FROM graft_stream.lksql_ds").collect() }
    assert(sql("DROP TABLE graft_delta.lksql_drop").head().getBoolean(0))
    intercept[Exception] {
      sql("SELECT * FROM graft_delta.lksql_drop").collect()
    }
    intercept[Exception] { sql("DROP TABLE graft_delta.lksql_drop") }
    assert(!sql("DROP TABLE IF EXISTS graft_delta.lksql_drop")
      .head().getBoolean(0), "IF EXISTS tolerates absence")
  }

  test("DESCRIBE / SHOW TABLES / SHOW STREAMS") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_meta_src")
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_meta " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM lksql_meta_src")
    val desc = sql("DESCRIBE graft_paimon.lksql_meta")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(desc.map(_._1).toSeq == Seq("k", "p", "v"))
    assert(desc.find(_._1 == "p").get._3 == "partition, primary key")
    assert(desc.find(_._1 == "k").get._3 == "primary key")
    assert(desc.find(_._1 == "v").get._3 == "")
    val tables = sql("SHOW TABLES IN graft_paimon")
      .collect().map(_.getString(0))
    assert(tables.contains("lksql_meta"))
    val wh = spark.conf.getOption("spark.graft.lakehouse.dir")
      .getOrElse("target/lakehouse")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$wh/_streams/lksql_show.json")): Unit
    sql("CREATE STREAM graft_stream.lksql_show ON TABLE graft_paimon.lksql_meta")
    val streams = sql("SHOW STREAMS").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(streams.contains(("lksql_show", "graft_paimon.lksql_meta")))
  }

  test("PK upsert composes with a transformed (bucket) partition spec") {
    val s2 = spark
    import s2.implicits._
    import graft.plans.LakehouseSql
    Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40), (5L, 50), (6L, 60))
      .toDF("k", "v").createOrReplaceTempView("lksql_bku_src")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_bku PRIMARY KEY (k) " +
      "PARTITIONED BY (bucket(4, k)) AS SELECT * FROM lksql_bku_src")
    // INSERT on a PK table is an UPSERT: k=2 replaces, k=9 is new —
    // the new data files stamp the bucket spec like every append
    sql("INSERT INTO graft_iceberg.lksql_bku " +
      "SELECT 2 AS k, 222 AS v UNION ALL SELECT 9 AS k, 90 AS v")
    val got = sql("SELECT k, v FROM graft_iceberg.lksql_bku ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 10), (2L, 222), (3L, 30), (4L, 40), (5L, 50),
      (6L, 60), (9L, 90)), s"upsert over bucket spec: $got")
    // key equality still prunes through the spec transform
    assert(sql("SELECT v FROM graft_iceberg.lksql_bku WHERE k = 2")
      .head().getInt(0) == 222)
    val scan = LakehouseSql.lastScans.headOption.getOrElse(
      fail("bucket-spec PK read must record a pruned scan"))
    assert(scan.plannedFiles < scan.totalFiles,
      s"key equality must prune the bucket spec: $scan")
    // UPDATE rides the same upsert machinery
    sql("UPDATE graft_iceberg.lksql_bku SET v = v + 1 WHERE k = 9")
    assert(sql("SELECT v FROM graft_iceberg.lksql_bku WHERE k = 9")
      .head().getInt(0) == 91)
  }

  test("MERGE ON-clause partition conjunct prunes the target planning") {
    val s2 = spark
    import s2.implicits._
    import graft.plans.LakehouseSql
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30), (4L, "A", 40))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_mp_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_mp " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_mp_src")
    Seq((1L, "A", 5), (4L, "A", 6)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mp_upd")
    sql("MERGE INTO graft_delta.lksql_mp t USING lksql_mp_upd s " +
      "ON t.k = s.k AND t.p = 'A' " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    val scan = LakehouseSql.lastScans.find(_.fmt == "delta").getOrElse(
      fail("MERGE must record its pruned target scan"))
    assert(scan.plannedFiles == 1 && scan.totalFiles == 3,
      s"ON t.p='A' must plan one partition's files: $scan")
    val got = sql("SELECT k, v FROM graft_delta.lksql_mp ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 5), (2L, 20), (3L, 30), (4L, 6)))
  }

  test("SQL maintenance verbs: OPTIMIZE/VACUUM/RESTORE round-trip") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_mx_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_mx " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_mx_src")
    sql("DELETE FROM graft_delta.lksql_mx WHERE k = 2")
    // RESTORE rewinds to the pre-delete version (metadata-only)
    sql("RESTORE TABLE graft_delta.lksql_mx TO VERSION AS OF 0")
    assert(sql("SELECT k FROM graft_delta.lksql_mx ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    sql("DELETE FROM graft_delta.lksql_mx WHERE k = 1")
    sql("OPTIMIZE graft_delta.lksql_mx")
    val reclaimed = sql("VACUUM graft_delta.lksql_mx").head().getLong(0)
    assert(reclaimed > 0, "VACUUM must reclaim the superseded files")
    assert(sql("SELECT k FROM graft_delta.lksql_mx ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    // OPTIMIZE on paimon = FULL COMPACTION: the bucket's LSM files merge
    // into one max-level file in ONE COMPACT snapshot; a deleted key is
    // physically gone from the rewritten files, reads are unchanged
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_mx PRIMARY KEY (p, k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_mx_src")
    sql("INSERT INTO graft_paimon.lksql_mx " +
      "SELECT 4 AS k, 'A' AS p, 40 AS v UNION ALL " +
      "SELECT 1 AS k, 'A' AS p, 11 AS v") // upsert k=1
    sql("DELETE FROM graft_paimon.lksql_mx WHERE k = 2")
    def pmFiles(): Seq[graft.ops.PaimonLite.FileMeta] =
      graft.ops.PaimonLite.planFiles(
        new java.io.File("target/lakehouse/paimon/lksql_mx").getAbsolutePath)
    val before = pmFiles()
    assert(before.groupBy(f => (f.part, f.bucket)).exists(_._2.size > 1),
      "compaction premise: some bucket holds >1 file before OPTIMIZE")
    val preSnap = graft.ops.PaimonLite.latestSnapshotId(
      new java.io.File("target/lakehouse/paimon/lksql_mx").getAbsolutePath)
    sql("OPTIMIZE graft_paimon.lksql_mx")
    val after = pmFiles()
    assert(after.groupBy(f => (f.part, f.bucket)).forall(_._2.size == 1),
      s"every bucket must hold exactly one file after full compaction: $after")
    assert(after.forall(_.level == graft.ops.PaimonWriter.MaxLevel),
      "rewrites land at max level")
    val got = sql("SELECT k, v FROM graft_paimon.lksql_mx ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 11), (3L, 30), (4L, 40)),
      s"reads unchanged across compaction: $got")
    // time travel to the pre-compaction snapshot still sees old files
    assert(sql("SELECT k FROM graft_paimon.lksql_mx " +
      s"FOR VERSION AS OF $preSnap ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    // a second OPTIMIZE has no merge debt — no new snapshot
    sql("OPTIMIZE graft_paimon.lksql_mx")
    assert(graft.ops.PaimonLite.latestSnapshotId(
      new java.io.File("target/lakehouse/paimon/lksql_mx").getAbsolutePath)
      == preSnap + 1, "idempotent OPTIMIZE must not commit a second snapshot")
  }

  test("conditional MERGE clauses: first-match-wins, unclaimed rows stay") {
    val s2 = spark
    import s2.implicits._
    // delta (positional): UPDATE + DELETE + guarded INSERT in ONE commit
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30), (4L, "B", 40))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_cm_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_cm " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_cm_src")
    // source: k=1 (small v → update), k=2 (big v → delete), k=3
    // (guard misses both → untouched), k=9 (new, guard accepts),
    // k=10 (new, guard rejects)
    Seq((1L, "A", 5), (2L, "A", 99), (3L, "B", 50), (9L, "A", 90),
        (10L, "A", -1)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_cm_upd")
    def versions(): Long = Option(new java.io.File(
      "target/lakehouse/delta/lksql_cm/_delta_log").listFiles())
      .getOrElse(Array.empty)
      .count(_.getName.matches("\\d{20}\\.json")).toLong
    val v0 = versions()
    sql("MERGE INTO graft_delta.lksql_cm t USING lksql_cm_upd s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND s.v < 10 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED AND s.v > 90 THEN DELETE " +
      "WHEN NOT MATCHED AND s.v >= 0 THEN INSERT *")
    assert(versions() == v0 + 1,
      "conditional MERGE must commit exactly one version")
    val got = sql("SELECT k, v FROM graft_delta.lksql_cm ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 5), (3L, 30), (4L, 40), (9L, 90)),
      s"k=1 updated, k=2 deleted, k=3 unclaimed stays, k=10 guard-rejected: $got")
    // paimon PK: same semantics through one LSM commit
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_cm PRIMARY KEY (p, k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_cm_src")
    sql("MERGE INTO graft_paimon.lksql_cm t USING lksql_cm_upd s " +
      "ON t.k = s.k AND t.p = s.p " +
      "WHEN MATCHED AND s.v < 10 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED AND s.v > 90 THEN DELETE " +
      "WHEN NOT MATCHED AND s.v >= 0 THEN INSERT *")
    val got2 = sql("SELECT k, v FROM graft_paimon.lksql_cm ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got2 == Seq((1L, 5), (3L, 30), (4L, 40), (9L, 90)), s"paimon: $got2")
    // an unguarded clause before another is unreachable — loud
    val e = intercept[Exception] {
      sql("MERGE INTO graft_delta.lksql_cm t USING lksql_cm_upd s " +
        "ON t.k = s.k WHEN MATCHED THEN DELETE " +
        "WHEN MATCHED AND s.v < 10 THEN UPDATE SET v = s.v")
    }
    assert(e.getMessage.contains("must be the last"), s"got: ${e.getMessage}")
  }

  test("INSERT INTO t (cols): positional subset with null-fill") {
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_ic " +
      "(k BIGINT, p STRING, v INT, note STRING) PARTITIONED BY (p)")
    sql("INSERT INTO graft_delta.lksql_ic (k, p, v) VALUES (1, 'A', 10)")
    sql("INSERT INTO graft_delta.lksql_ic (p, k, note) " +
      "SELECT 'B', 2, 'hello'")
    val got = sql("SELECT k, v, note FROM graft_delta.lksql_ic ORDER BY k")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) "" else r.getString(2))).toSeq
    assert(got == Seq((1L, 10, ""), (2L, -1, "hello")), s"got: $got")
    // the partition column must be named — a null routing key has no home
    assert(intercept[Exception] {
      sql("INSERT INTO graft_delta.lksql_ic (k, v) VALUES (3, 30)")
    }.getMessage.contains("partition"))
  }

  test("p <> 'x' prunes the excluded partition only") {
    val s2 = spark
    import s2.implicits._
    import graft.plans.LakehouseSql
    Seq((1L, "A", 1), (2L, "B", 2), (3L, "C", 3)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_ne_src")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_ne " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_ne_src")
    val got = sql("SELECT k FROM graft_iceberg.lksql_ne WHERE p <> 'B' " +
      "ORDER BY k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L))
    val scan = LakehouseSql.lastScans.headOption.getOrElse(
      sys.error("no scan recorded"))
    assert(scan.plannedFiles == 2 && scan.totalFiles == 3,
      s"exclusion must prune exactly the excluded partition: $scan")
  }

  test("CREATE TABLE (cols) / first INSERT / TRUNCATE: empty-table lifecycle") {
    for ((fmt, pk) <- Seq(("iceberg", ""), ("delta", ""),
        ("hudi", "PRIMARY KEY (k) "), ("paimon", "PRIMARY KEY (p, k) "))) {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_et " +
        s"(k BIGINT, p STRING, v INT) ${pk}PARTITIONED BY (p)")
      // an empty read serves the DECLARED schema with zero rows
      val empty = sql(s"SELECT * FROM graft_$fmt.lksql_et")
      assert(empty.columns.toSeq == Seq("k", "p", "v") && empty.count() == 0,
        s"$fmt: created-empty read")
      // zero-match DML on an empty table is a successful no-op
      sql(s"DELETE FROM graft_$fmt.lksql_et WHERE k = 1")
      // first INSERT — the VALUES spelling, positional
      sql(s"INSERT INTO graft_$fmt.lksql_et VALUES " +
        "(1, 'A', 10), (2, 'B', 20)")
      assert(sql(s"SELECT k FROM graft_$fmt.lksql_et ORDER BY k")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L),
        s"$fmt: first insert")
      // second INSERT takes the normal append/upsert route
      sql(s"INSERT INTO graft_$fmt.lksql_et VALUES (3, 'A', 30)")
      assert(sql(s"SELECT count(*) AS n FROM graft_$fmt.lksql_et")
        .head().getLong(0) == 3L, s"$fmt: second insert")
      // TRUNCATE: one atomic commit, all rows gone, schema survives
      sql(s"TRUNCATE TABLE graft_$fmt.lksql_et")
      val post = sql(s"SELECT * FROM graft_$fmt.lksql_et")
      assert(post.columns.toSeq == Seq("k", "p", "v") && post.count() == 0,
        s"$fmt: truncated read")
      // idempotent re-TRUNCATE is a no-op
      sql(s"TRUNCATE TABLE graft_$fmt.lksql_et")
      // refill after truncate (hudi lays fresh base groups)
      sql(s"INSERT INTO graft_$fmt.lksql_et VALUES (9, 'A', 90)")
      val refill = sql(s"SELECT k, v FROM graft_$fmt.lksql_et")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(refill == Seq((9L, 90)), s"$fmt: refill after truncate: $refill")
    }
    // introspection works off the declared schema of an EMPTY table
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_et2 " +
      "(a BIGINT, b STRING) PARTITIONED BY (b)")
    assert(sql("SHOW CREATE TABLE graft_delta.lksql_et2").head().getString(0)
      == "CREATE TABLE graft_delta.lksql_et2 (a BIGINT, b STRING) " +
        "PARTITIONED BY (b)")
    assert(sql("DESCRIBE graft_delta.lksql_et2").count() == 2L)
    // INSERT OVERWRITE into a created-empty table: zero removes, one
    // atomic commit
    sql("INSERT OVERWRITE graft_delta.lksql_et2 SELECT 5 AS a, 'X' AS b")
    assert(sql("SELECT a FROM graft_delta.lksql_et2").head().getLong(0) == 5L)
  }

  test("a table stream created on an EMPTY table ships the first insert") {
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_es " +
      "(k BIGINT, p STRING) PARTITIONED BY (p)")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      "target/lakehouse/_streams/es_s.json")): Unit
    sql("CREATE STREAM graft_stream.es_s ON TABLE graft_delta.lksql_es")
    // nothing to consume yet — the empty window, feed-shaped
    assert(sql("SELECT * FROM graft_stream.es_s").count() == 0)
    sql("INSERT INTO graft_delta.lksql_es VALUES (1, 'A'), (2, 'B')")
    val win = sql("SELECT k, _CHANGE_TYPE FROM graft_stream.es_s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(win == Seq((1L, "insert"), (2L, "insert")),
      s"the first insert window must ship: $win")
    // consumed — and a TRUNCATE window ships the deletes (delta CDC
    // derives them from the removes-only commit's dataChange markers)
    sql("TRUNCATE TABLE graft_delta.lksql_es")
    val del = sql("SELECT k, _CHANGE_TYPE FROM graft_stream.es_s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sortBy(_._1)
    assert(del == Seq((1L, "delete"), (2L, "delete")),
      s"the truncate window must ship deletes: $del")
    sql("DROP STREAM graft_stream.es_s")
  }

  test("SHOW PARTITIONS and SHOW CREATE TABLE") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_sm_src")
    // identity-partitioned hudi PK table
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_sm PRIMARY KEY (k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_sm_src")
    val parts = sql("SHOW PARTITIONS graft_hudi.lksql_sm")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(parts.map(_._1) == Seq("A", "B") && parts.forall(_._2 >= 1),
      s"hudi partitions: $parts")
    val stmt = sql("SHOW CREATE TABLE graft_hudi.lksql_sm").head().getString(0)
    assert(stmt == "CREATE TABLE graft_hudi.lksql_sm " +
      "(k BIGINT, p STRING, v INT) PRIMARY KEY (k) PARTITIONED BY (p)",
      s"got: $stmt")
    // transformed iceberg spec renders its call spelling back
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_sm " +
      "PARTITIONED BY (bucket(4, k)) AS SELECT * FROM lksql_sm_src")
    val stmt2 = sql("SHOW CREATE TABLE graft_iceberg.lksql_sm")
      .head().getString(0)
    assert(stmt2 == "CREATE TABLE graft_iceberg.lksql_sm " +
      "(k BIGINT, p STRING, v INT) PARTITIONED BY (bucket(4, k))",
      s"got: $stmt2")
    val bparts = sql("SHOW PARTITIONS graft_iceberg.lksql_sm")
      .collect().map(_.getString(0)).toSeq
    assert(bparts.nonEmpty && bparts.forall(_.forall(_.isDigit)),
      s"bucket partitions are stored hash values: $bparts")
  }

  test("ALTER COLUMN TYPE widening: metadata-only on all four formats") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_wd_src")
    for ((fmt, pk) <- Seq(("iceberg", ""), ("delta", ""),
        ("hudi", "PRIMARY KEY (k) "), ("paimon", "PRIMARY KEY (p, k) "))) {
      sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_wd $pk" +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_wd_src")
      // hudi: seed a LOG block carrying the narrow int (an upsert of
      // k=2) so the avro decode-coercion path is exercised
      if (fmt == "hudi")
        sql("INSERT INTO graft_hudi.lksql_wd SELECT 2 AS k, 'A' AS p, 21 AS v")
      sql(s"ALTER TABLE graft_$fmt.lksql_wd ALTER COLUMN v TYPE BIGINT")
      // a value only BIGINT can hold proves the declared type moved
      sql(s"INSERT INTO graft_$fmt.lksql_wd " +
        "SELECT 9 AS k, 'B' AS p, CAST(5000000000 AS BIGINT) AS v")
      val got = sql(s"SELECT CAST(sum(v) AS BIGINT) AS s, count(*) AS n " +
        s"FROM graft_$fmt.lksql_wd").head()
      val base = if (fmt == "hudi") 61L else 60L
      assert((got.getLong(0), got.getLong(1)) == (5000000000L + base, 4L),
        s"$fmt widen round-trip: $got")
    }
    // the delta widen commit carries the typeWidening table feature
    // (PROTOCOL.md: reader 3 / writer 7 with the feature in both lists)
    val logDir = new java.io.File("target/lakehouse/delta/lksql_wd/_delta_log")
    assert(Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".json"))
      .exists(f => java.nio.file.Files.readString(f.toPath)
        .contains("\"typeWidening\"")),
      "the widen commit must compose the typeWidening protocol upgrade")
    // decimal PRECISION widening (scale pinned): metadata-only too
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_wd2 " +
      "PARTITIONED BY (p) AS SELECT 1 AS k, 'A' AS p, " +
      "CAST(12.34 AS DECIMAL(5,2)) AS d")
    sql("ALTER TABLE graft_iceberg.lksql_wd2 ALTER COLUMN d TYPE DECIMAL(20,2)")
    sql("INSERT INTO graft_iceberg.lksql_wd2 SELECT 2 AS k, 'B' AS p, " +
      "CAST(123456789012345678.99 AS DECIMAL(20,2)) AS d")
    val dsum = sql("SELECT CAST(sum(d) AS STRING) AS s " +
      "FROM graft_iceberg.lksql_wd2").head().getString(0)
    assert(dsum == "123456789012345691.33", s"decimal widen sum: $dsum")
    // a BARE scale bump shrinks the integer digits — the cast is not
    // total, so neither tier takes it: loud
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_iceberg.lksql_wd2 ALTER COLUMN d TYPE DECIMAL(20,4)")
    }.getMessage.contains("cannot alter"))
    // ...but integer-digit-preserving scale growth is a sanctioned
    // REWRITE: (20,2) -> (22,4) re-scales every value, one atomic commit
    sql("ALTER TABLE graft_iceberg.lksql_wd2 ALTER COLUMN d TYPE DECIMAL(22,4)")
    val dsum2 = sql("SELECT CAST(sum(d) AS STRING) AS s " +
      "FROM graft_iceberg.lksql_wd2").head().getString(0)
    assert(dsum2 == "123456789012345691.3300", s"rescaled sum: $dsum2")
    // guards: partition column, PRIMARY KEY column, narrowing
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_delta.lksql_wd ALTER COLUMN p TYPE BIGINT")
    }.getMessage.contains("partition"))
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_paimon.lksql_wd ALTER COLUMN k TYPE BIGINT")
    }.getMessage.contains("PRIMARY KEY"))
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_delta.lksql_wd ALTER COLUMN v TYPE INT")
    }.getMessage.contains("cannot alter"))
  }

  test("multi-field and transformed specs prune DML target planning") {
    val s2 = spark
    import s2.implicits._
    import graft.plans.LakehouseSql
    val rows = (1 to 64).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-${(i % 8) + 1}%02d 10:00:00"), i))
    rows.toDF("k", "ts", "v").createOrReplaceTempView("lksql_msd_src")
    // multi-field spec: DELETE by the bucket component plans a subset
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_msd " +
      "PARTITIONED BY (days(ts), bucket(8, k)) AS SELECT * FROM lksql_msd_src")
    sql("DELETE FROM graft_iceberg.lksql_msd WHERE k = 7")
    val scan = LakehouseSql.lastScans.headOption.getOrElse(
      sys.error("DML probe must record a scan"))
    assert(scan.plannedFiles >= 1 && scan.plannedFiles * 2 <= scan.totalFiles,
      s"multi-field DELETE must plan a strict file subset: $scan")
    assert(sql("SELECT count(*) AS n FROM graft_iceberg.lksql_msd")
      .head().getLong(0) == 63L)
    assert(sql("SELECT count(*) AS n FROM graft_iceberg.lksql_msd WHERE k = 7")
      .head().getLong(0) == 0L)
    // single transformed spec: UPDATE through bucket(4, k) plans a
    // subset AND the replacement rows stay in the bucket spec (a later
    // key-equality read still prunes to a strict subset)
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_msd1 " +
      "PARTITIONED BY (bucket(4, k)) AS SELECT * FROM lksql_msd_src")
    sql("UPDATE graft_iceberg.lksql_msd1 SET v = v + 100 WHERE k = 9")
    val scan1 = LakehouseSql.lastScans.headOption.getOrElse(
      sys.error("DML probe must record a scan"))
    assert(scan1.plannedFiles >= 1 && scan1.plannedFiles * 2 <= scan1.totalFiles,
      s"transformed UPDATE must plan a strict file subset: $scan1")
    assert(sql("SELECT v FROM graft_iceberg.lksql_msd1 WHERE k = 9")
      .head().getInt(0) == 109)
    assert(sql("SELECT CAST(sum(v) AS BIGINT) AS s FROM graft_iceberg.lksql_msd1")
      .head().getLong(0) == (1 to 64).sum.toLong + 100L)
    sql("SELECT v FROM graft_iceberg.lksql_msd1 WHERE k = 9").collect(): Unit
    val postScan = LakehouseSql.lastScans.headOption.getOrElse(
      sys.error("read must record a scan"))
    assert(postScan.plannedFiles * 2 <= postScan.totalFiles,
      s"post-UPDATE key read must still prune (replacement rows stay in " +
        s"the bucket spec): $postScan")
  }

  test("hudi conditional MERGE with update AND delete clauses is ONE instant") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30), (4L, "B", 40))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_hcm_src")
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_hcm PRIMARY KEY (k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_hcm_src")
    Seq((1L, "A", 5), (2L, "A", 99), (9L, "A", 90)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_hcm_upd")
    def instants(): Long = Option(new java.io.File(
      "target/lakehouse/hudi/lksql_hcm/.hoodie").listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.endsWith(".commit") ||
        f.getName.endsWith(".deltacommit")).toLong
    val i0 = instants()
    sql("MERGE INTO graft_hudi.lksql_hcm t USING lksql_hcm_upd s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND s.v < 10 THEN UPDATE SET v = s.v " +
      "WHEN MATCHED AND s.v > 90 THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *")
    assert(instants() == i0 + 1,
      "update+delete+insert MERGE must land ONE hudi deltacommit " +
        "(delete blocks and data blocks share the instant)")
    val got = sql("SELECT k, v FROM graft_hudi.lksql_hcm ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 5), (3L, 30), (4L, 40), (9L, 90)),
      s"k=1 updated, k=2 deleted, k=9 inserted: $got")
    // time travel to the pre-merge instant still sees the old state —
    // the merged instant is one atomic point in the timeline
    val pre = sql("SELECT k, v FROM graft_hudi.lksql_hcm " +
      s"FOR VERSION AS OF ${i0} ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(pre == Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)), s"travel: $pre")
  }

  test("stream cursor commits on SUCCESS: a failed consume re-serves the window") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_scs_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_scs " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_scs_src")
    sql("CREATE STREAM graft_stream.scs_s ON TABLE graft_delta.lksql_scs")
    sql("INSERT INTO graft_delta.lksql_scs SELECT 2 AS k, 'A' AS p")
    // a consuming statement that fails MID-EXECUTION must not advance
    // the cursor — the window re-serves (at-least-once)
    spark.udf.register("lksql_scs_boom", (_: Long) =>
      { throw new RuntimeException("injected consume crash"); 0L })
    intercept[Exception] {
      sql("SELECT lksql_scs_boom(k) FROM graft_stream.scs_s").collect()
    }
    val reserved = sql("SELECT k FROM graft_stream.scs_s")
      .collect().map(_.getLong(0)).toSeq
    assert(reserved == Seq(2L),
      "the failed consume must not have advanced the cursor")
    // ...and after the SUCCESSFUL consume the cursor is committed:
    // the next read is empty
    assert(sql("SELECT k FROM graft_stream.scs_s").collect().isEmpty,
      "a successful consume commits the cursor")
    sql("DROP STREAM graft_stream.scs_s")
  }

  test("DELETE without WHERE is row-level delete-all; CREATE IF NOT EXISTS is a no-op") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_da_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_da " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_da_src")
    // IF NOT EXISTS on an existing table: successful no-op, content kept
    sql("CREATE TABLE IF NOT EXISTS graft_delta.lksql_da " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_da_src WHERE k > 100")
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_da")
      .head().getLong(0) == 2L, "IF NOT EXISTS must not replace the table")
    // both flags together are contradictory DDL
    assert(intercept[Exception] {
      sql("CREATE OR REPLACE TABLE IF NOT EXISTS graft_delta.lksql_da " +
        "PARTITIONED BY (p) AS SELECT * FROM lksql_da_src")
    }.getMessage.contains("mutually exclusive"))
    // ...and on a fresh name it creates
    sql("DROP TABLE IF EXISTS graft_delta.lksql_da2")
    sql("CREATE TABLE IF NOT EXISTS graft_delta.lksql_da2 " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_da_src")
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_da2")
      .head().getLong(0) == 2L)
    // unfiltered DELETE: row-level delete-all (a stream ships every row
    // as a delete — the CDC-visible contrast to TRUNCATE)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      "target/lakehouse/_streams/da_s.json")): Unit
    sql("CREATE STREAM graft_stream.da_s ON TABLE graft_delta.lksql_da")
    sql("DELETE FROM graft_delta.lksql_da")
    assert(sql("SELECT * FROM graft_delta.lksql_da").collect().isEmpty)
    val win = sql("SELECT k, _CHANGE_TYPE FROM graft_stream.da_s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(win == Set((1L, "delete"), (2L, "delete")),
      s"delete-all must ship every row as a delete: $win")
    sql("DROP STREAM graft_stream.da_s")
  }

  test("TRUNCATE PARTITION: metadata-only on all four formats") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "A", 30), (4L, "C", 40))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_tp_src")
    Seq(("iceberg", ""), ("delta", ""), ("paimon", "PRIMARY KEY (p, k) "),
      ("hudi", "PRIMARY KEY (k) "))
      .foreach { case (fmt, pk) =>
        sql(s"CREATE OR REPLACE TABLE graft_$fmt.lksql_tp $pk" +
          "PARTITIONED BY (p) AS SELECT * FROM lksql_tp_src")
        val dataBytes = {
          def walk(f: java.io.File): Long =
            Option(f.listFiles()).getOrElse(Array.empty).map(c =>
              if (c.isDirectory) walk(c)
              else if (c.getName.endsWith(".parquet")) c.length() else 0L).sum
          () => walk(new java.io.File(s"target/lakehouse/$fmt/lksql_tp"))
        }
        val before = dataBytes()
        sql(s"TRUNCATE TABLE graft_$fmt.lksql_tp PARTITION (p = 'A')")
        val got = sql(s"SELECT k FROM graft_$fmt.lksql_tp ORDER BY k")
          .collect().map(_.getLong(0)).toSeq
        assert(got == Seq(2L, 4L), s"$fmt truncate-partition: $got")
        // metadata-only: no data parquet written or removed on disk
        assert(dataBytes() == before,
          s"$fmt TRUNCATE PARTITION must not move data bytes")
        // absent partition: standard no-op
        sql(s"TRUNCATE TABLE graft_$fmt.lksql_tp PARTITION (p = 'ZZ')")
        assert(sql(s"SELECT count(*) AS n FROM graft_$fmt.lksql_tp")
          .head().getLong(0) == 2L)
        // the partition refills
        sql(s"INSERT INTO graft_$fmt.lksql_tp SELECT 9 AS k, 'A' AS p, 90 AS v")
        assert(sql(s"SELECT k FROM graft_$fmt.lksql_tp ORDER BY k")
          .collect().map(_.getLong(0)).toSeq == Seq(2L, 4L, 9L), s"$fmt refill")
      }
    // iceberg: the feed ships the truncated partition as deletes
    // (snapshot diff); stats-bearing manifests survived — a pruned read
    // still plans a strict subset
    sql("SELECT count(*) AS n FROM graft_iceberg.lksql_tp WHERE p = 'B'")
      .collect(): Unit
    val scan = graft.plans.LakehouseSql.lastScans.headOption
    assert(scan.exists(s => s.plannedFiles < s.totalFiles),
      s"pruning must survive the manifest rewrite: $scan")
    // hudi: a truncated key re-inserts as a NEW key (the replay
    // dropped its file group — no stale pre-truncate state resurfaces),
    // and time travel to the pre-truncate instant still sees it
    sql("SELECT k FROM graft_hudi.lksql_tp WHERE k = 9").collect()
    sql("INSERT INTO graft_hudi.lksql_tp SELECT 1 AS k, 'A' AS p, 111 AS v")
    assert(sql("SELECT v FROM graft_hudi.lksql_tp WHERE k = 1")
      .head().getInt(0) == 111, "a truncated key must re-insert fresh")
    // transformed specs refuse (truncate by transformed value is
    // row-level territory)
    spark.range(0, 10).selectExpr("id AS k",
      "timestamp(date_add(date'2024-01-01', cast(id as int))) AS ts")
      .createOrReplaceTempView("lksql_tp_tr")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_tptr " +
      "PARTITIONED BY (days(ts)) AS SELECT * FROM lksql_tp_tr")
    assert(intercept[Exception] {
      sql("TRUNCATE TABLE graft_delta.lksql_tptr PARTITION (ts = '2024-01-02')")
    }.getMessage.contains("identity"))
  }

  test("hudi INSERT into a never-seen partition lays a lazy file group") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_hlz_src")
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_hlz PRIMARY KEY (k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_hlz_src")
    // the partition value 'B' never existed — the upsert lays a fresh
    // base file group in the same deltacommit (lazy group creation)
    sql("INSERT INTO graft_hudi.lksql_hlz SELECT 2 AS k, 'B' AS p, 20 AS v")
    assert(sql("SELECT k, v FROM graft_hudi.lksql_hlz ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 10), (2L, 20)))
    // the lazy group is real: the key updates in place afterwards
    sql("INSERT INTO graft_hudi.lksql_hlz SELECT 2 AS k, 'B' AS p, 22 AS v")
    assert(sql("SELECT v FROM graft_hudi.lksql_hlz WHERE k = 2")
      .head().getInt(0) == 22)
  }

  test("MERGE USING (subquery) source, alias required") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_sq_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_sq " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_sq_tgt")
    // the subquery references a LAKEHOUSE table itself — rewritten
    // recursively through the parser
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_sq_src " +
      "PARTITIONED BY (p) AS SELECT k, p, v * 100 AS v FROM lksql_sq_tgt")
    sql("MERGE INTO graft_delta.lksql_sq t USING " +
      "(SELECT k, p, v + coalesce(v, 0) AS v FROM graft_delta.lksql_sq_src " +
      "WHERE k = 1) s " +
      "ON t.k = s.k WHEN MATCHED THEN UPDATE SET v = s.v")
    val got = sql("SELECT k, v FROM graft_delta.lksql_sq ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 2000), (2L, 20)), s"subquery-source merge: $got")
    assert(intercept[Exception] {
      sql("MERGE INTO graft_delta.lksql_sq t USING " +
        "(SELECT 1 AS k) ON t.k = 1 WHEN MATCHED THEN DELETE")
    }.getMessage.contains("alias"))
    // NESTED subqueries (r15: balanced-paren extraction, any depth) —
    // the inner derived table and an IN-subquery both sit below the
    // outer parens, and a literal carrying ')' must not end the scan
    sql("MERGE INTO graft_delta.lksql_sq t USING " +
      "(SELECT k, v FROM (SELECT k, v * 2 AS v FROM " +
      "(SELECT k, v FROM graft_delta.lksql_sq_src) inner2 " +
      "WHERE k IN (SELECT k FROM lksql_sq_tgt WHERE p <> 'x)y')) inner1) s " +
      "ON t.k = s.k WHEN MATCHED AND s.k = 2 THEN UPDATE SET v = s.v")
    val got2 = sql("SELECT k, v FROM graft_delta.lksql_sq ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got2 == Seq((1L, 2000), (2L, 4000)),
      s"nested-subquery-source merge: $got2")
  }

  test("MERGE clause grammar: three matched clauses, VALUES inserts, first-match-wins") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "A", 30), (4L, "A", 40))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_mg3_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_mg3 " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_mg3_tgt")
    Seq((1L, "A", 1), (2L, "A", 2), (3L, "A", 3), (9L, "A", 9))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_mg3_src")
    // three matched clauses: the FIRST whose guard holds claims the row
    // (k=1 → +100; k=2 → DELETE; k=3 → +300); the guard-free insert
    // takes the rest
    sql("MERGE INTO graft_delta.lksql_mg3 t USING lksql_mg3_src s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND s.v = 1 THEN UPDATE SET v = s.v + 100 " +
      "WHEN MATCHED AND s.v = 2 THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET v = s.v + 300 " +
      "WHEN NOT MATCHED THEN INSERT VALUES (s.k, s.p, s.v * 1000)")
    val got = sql("SELECT k, v FROM graft_delta.lksql_mg3 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 101), (3L, 303), (4L, 40), (9L, 9000)),
      s"three-clause merge: $got")
    // guard discipline: only the LAST clause of a kind may be unguarded
    val e = intercept[Exception] {
      sql("MERGE INTO graft_delta.lksql_mg3 t USING lksql_mg3_src s " +
        "ON t.k = s.k WHEN MATCHED THEN DELETE " +
        "WHEN MATCHED AND s.v = 1 THEN UPDATE SET v = 0")
    }
    assert(e.getMessage.contains("must be the last"), e.getMessage)
  }

  test("MERGE resolves UNQUALIFIED column references like the plain join spelling") {
    val s2 = spark
    import s2.implicits._
    // target column `tv` and source column `sv` exist on exactly one
    // side each — bare references must resolve (the r13 `t JOIN s`
    // behavior); `k` is on both sides, so bare `k` stays ambiguous and
    // qualified access is required for it
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "tv")
      .createOrReplaceTempView("lksql_bare_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_bare " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_bare_tgt")
    Seq((1L, 4), (2L, 7), (9L, 90)).toDF("k", "sv")
      .createOrReplaceTempView("lksql_bare_src")
    sql("MERGE INTO graft_delta.lksql_bare t USING lksql_bare_src s " +
      "ON t.k = s.k " +
      "WHEN MATCHED AND sv > 5 THEN UPDATE SET tv = tv + sv " +
      "WHEN NOT MATCHED THEN INSERT (k, p, tv) VALUES (s.k, 'A', sv)")
    val got = sql("SELECT k, tv FROM graft_delta.lksql_bare ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 10), (2L, 27), (3L, 30), (9L, 90)),
      s"bare-name guard/SET merge: $got")
  }

  test("delete-only MERGE still runs the cardinality probe") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_dcard_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_dcard " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_dcard_tgt")
    // two source rows match target k=1 under a LONE DELETE clause:
    // standard MERGE (and Delta, SQL Server) raise the cardinality
    // violation regardless of clause kind — never silently delete once
    Seq((1L, 1), (1L, 2)).toDF("k", "sv")
      .createOrReplaceTempView("lksql_dcard_dup")
    val e = intercept[Exception] {
      sql("MERGE INTO graft_delta.lksql_dcard t USING lksql_dcard_dup s " +
        "ON t.k = s.k WHEN MATCHED THEN DELETE")
    }
    assert(e.getMessage.contains("cardinality"), e.getMessage)
    assert(sql("SELECT count(*) FROM graft_delta.lksql_dcard")
      .head().getLong(0) == 2L, "the failed MERGE must not have deleted")
  }

  test("string literals with commas survive VALUES and SET splitting") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", "old")).toDF("k", "p", "note")
      .createOrReplaceTempView("lksql_lit_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_lit " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_lit_tgt")
    Seq((2L, 0)).toDF("k", "sv").createOrReplaceTempView("lksql_lit_src")
    // a comma (and an unbalanced paren) INSIDE a literal is content,
    // not structure — the VALUES splitter must not mis-split on it
    sql("MERGE INTO graft_delta.lksql_lit t USING lksql_lit_src s " +
      "ON t.k = s.k " +
      "WHEN NOT MATCHED THEN INSERT (k, p, note) VALUES (s.k, 'A', 'a,b)c')")
    // and the UPDATE SET splitter: literal comma in one assignment of two
    sql("UPDATE graft_delta.lksql_lit SET note = 'x,(y', k = k WHERE k = 1")
    val got = sql("SELECT k, note FROM graft_delta.lksql_lit ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "x,(y"), (2L, "a,b)c")), s"literal commas: $got")
  }

  test("table stream on iceberg serves row-level UPDATE/DELETE windows") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10), (2L, "A", 20), (3L, "B", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_strd_src")
    sql("CREATE OR REPLACE TABLE graft_iceberg.lksql_strd " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_strd_src")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      "target/lakehouse/_streams/lksql_strd_s.json")): Unit
    sql("CREATE STREAM graft_stream.lksql_strd_s ON TABLE graft_iceberg.lksql_strd")
    sql("UPDATE graft_iceberg.lksql_strd SET v = v + 100 WHERE k = 2")
    val w1 = sql("SELECT k, v, _CHANGE_TYPE FROM graft_stream.lksql_strd_s")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(w1 == Set((2L, 20, "delete"), (2L, 120, "insert")),
      s"an iceberg UPDATE window is delete(pre-image)+insert: $w1")
    sql("DELETE FROM graft_iceberg.lksql_strd WHERE k = 1")
    val w2 = sql("SELECT k, _CHANGE_TYPE FROM graft_stream.lksql_strd_s")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(w2 == Set((1L, "delete")),
      s"an iceberg row-DELETE window must be non-empty: $w2")
  }

  test("MERGE with a lakehouse SOURCE prunes the source's file planning (matched-only)") {
    val s2 = spark
    import s2.implicits._
    // target: 3 partitions; source: a lakehouse table with 4 partitions
    Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30)).toDF("k", "p", "v")
      .createOrReplaceTempView("lksql_msp_tgt")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_msp " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_msp_tgt")
    Seq((1L, "A", 100), (2L, "B", 200), (8L, "C", 800), (9L, "D", 900))
      .toDF("k", "p", "v").createOrReplaceTempView("lksql_msp_src0")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_msps " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_msp_src0")
    // matched-only MERGE with a provable source-partition conjunct:
    // BOTH sides' file planning prunes to p='A'
    sql("MERGE INTO graft_delta.lksql_msp t USING graft_delta.lksql_msps s " +
      "ON t.k = s.k AND s.p = 'A' AND t.p = 'A' " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    val scans = graft.plans.LakehouseSql.lastScans
    val srcScan = scans.find(_.name == "lksql_msps").getOrElse(
      sys.error(s"no source scan recorded: $scans"))
    assert(srcScan.plannedFiles >= 1 && srcScan.plannedFiles < srcScan.totalFiles,
      s"the ON conjunct must prune the SOURCE's file planning: $srcScan")
    val tgtScan = scans.find(_.name == "lksql_msp").getOrElse(
      sys.error(s"no target scan recorded: $scans"))
    assert(tgtScan.plannedFiles < tgtScan.totalFiles,
      s"the ON conjunct must prune the TARGET's file planning: $tgtScan")
    val got = sql("SELECT k, v FROM graft_delta.lksql_msp ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 100), (2L, 20), (3L, 30)), s"merge result: $got")
    // WITH a NOT MATCHED clause the source must NOT prune — a
    // pruned-away row must still insert
    sql("MERGE INTO graft_delta.lksql_msp t USING graft_delta.lksql_msps s " +
      "ON t.k = s.k AND s.p = 'A' " +
      "WHEN MATCHED THEN UPDATE SET v = s.v " +
      "WHEN NOT MATCHED THEN INSERT *")
    val srcScan2 = graft.plans.LakehouseSql.lastScans.find(_.name == "lksql_msps")
    assert(srcScan2.isEmpty,
      s"a MERGE with NOT MATCHED must plan the source UNPRUNED: $srcScan2")
    // standard semantics: (2,'B') FAILS the s.p='A' conjunct, so it is
    // NOT MATCHED and inserts (a duplicate k — the target is keyless);
    // pruning the source by that conjunct would have LOST this insert,
    // which is exactly why the NOT MATCHED path plans unpruned
    val got2 = sql("SELECT k, v FROM graft_delta.lksql_msp ORDER BY k, v")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got2 == Seq((1L, 100), (2L, 20), (2L, 200), (3L, 30),
      (8L, 800), (9L, 900)),
      s"unmatched source rows must insert despite the s.p conjunct: $got2")
  }

  test("abandoned consume plans don't accumulate cursor listeners; window re-serves") {
    val s2 = spark
    import s2.implicits._
    Seq((0L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_lkr_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_lkr " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_lkr_src")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      "target/lakehouse/_streams/lkr_s.json")): Unit
    sql("CREATE STREAM graft_stream.lkr_s ON TABLE graft_delta.lksql_lkr")
    val base = graft.plans.LakehouseSql.cursorListenerCount
    // six consuming statements are REWRITTEN (staged + listener) but
    // never executed — each stages a wider (0, i] window
    (1 to 6).foreach { i =>
      sql(s"INSERT INTO graft_delta.lksql_lkr SELECT ${10 + i} AS k, 'A' AS p")
      sql("SELECT k FROM graft_stream.lkr_s"): Unit // no action
    }
    val live = graft.plans.LakehouseSql.cursorListenerCount - base
    assert(live <= 4,
      s"abandoned consumes left $live listeners — the keep-last-4 window " +
        "sweep must drop their listeners too")
    // the cursor never advanced: the next EXECUTED consume re-serves
    // every insert since stream creation
    val got = sql("SELECT k FROM graft_stream.lkr_s")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(got == (11L to 16L).toSeq, s"re-served window: $got")
    assert(sql("SELECT k FROM graft_stream.lkr_s").collect().isEmpty,
      "the successful consume commits the cursor")
    sql("DROP STREAM graft_stream.lkr_s")
  }

  test("interleaved consumers: monotone max-publish — one wins, one re-serves, no loss") {
    val s2 = spark
    import s2.implicits._
    Seq((0L, "A")).toDF("k", "p").createOrReplaceTempView("lksql_cc_src")
    sql("CREATE OR REPLACE TABLE graft_delta.lksql_cc " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_cc_src")
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      "target/lakehouse/_streams/cc_s.json")): Unit
    sql("CREATE STREAM graft_stream.cc_s ON TABLE graft_delta.lksql_cc")
    sql("INSERT INTO graft_delta.lksql_cc SELECT 1 AS k, 'A' AS p")
    // consumer A stages window (c0, c1] — plan held, not yet executed
    val dfA = sql("SELECT k FROM graft_stream.cc_s")
    sql("INSERT INTO graft_delta.lksql_cc SELECT 2 AS k, 'A' AS p")
    // consumer B stages the WIDER window (c0, c2]
    val dfB = sql("SELECT k FROM graft_stream.cc_s")
    // B executes first and wins: cursor → c2
    assert(dfB.collect().map(_.getLong(0)).toSeq.sorted == Seq(1L, 2L))
    // A executes after: its window re-serves (at-least-once duplicate),
    // and its stale c1 publication must NOT regress the cursor
    assert(dfA.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(sql("SELECT k FROM graft_stream.cc_s").collect().isEmpty,
      "stale consumer A's c1 publication regressed the committed c2 cursor")
    // and nothing was lost: a post-commit insert is served exactly once
    sql("INSERT INTO graft_delta.lksql_cc SELECT 3 AS k, 'A' AS p")
    assert(sql("SELECT k FROM graft_stream.cc_s")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    sql("DROP STREAM graft_stream.cc_s")
  }

  test("ALTER DROP/RENAME COLUMN guards: partition and PRIMARY KEY stay") {
    val s2 = spark
    import s2.implicits._
    Seq((1L, "A", 10, 1.5)).toDF("k", "p", "v", "x")
      .createOrReplaceTempView("lksql_alter_src")
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_alt PRIMARY KEY (p, k) " +
      "PARTITIONED BY (p) AS SELECT * FROM lksql_alter_src")
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_paimon.lksql_alt DROP COLUMN p")
    }.getMessage.contains("partition"))
    assert(intercept[Exception] {
      sql("ALTER TABLE graft_paimon.lksql_alt RENAME COLUMN k TO kk")
    }.getMessage.contains("PRIMARY KEY"))
    // the happy path round-trips: rename + drop + DESCRIBE reflects it
    sql("ALTER TABLE graft_paimon.lksql_alt RENAME COLUMN v TO val")
    sql("ALTER TABLE graft_paimon.lksql_alt DROP COLUMN x")
    val cols = sql("DESCRIBE graft_paimon.lksql_alt")
      .select("col_name").collect().map(_.getString(0)).toSeq
    assert(cols == Seq("k", "p", "val"), s"got $cols")
    assert(sql("SELECT val FROM graft_paimon.lksql_alt").head().getInt(0) == 10)
  }

  test("table references inside string literals are text, not tables") {
    import graft.plans.LakehouseSql
    // a pure literal mention is not even routed
    assert(!LakehouseSql.handles("SELECT 'graft_iceberg.lksql_nope' AS s"))
    // mixed: the real reference resolves, the literal survives verbatim
    val row = sql("SELECT 'graft_iceberg.lksql_nope' AS s, count(*) AS n " +
      "FROM graft_iceberg.lksql_pr").head()
    assert(row.getString(0) == "graft_iceberg.lksql_nope" && row.getLong(1) == 6L)
  }
}
