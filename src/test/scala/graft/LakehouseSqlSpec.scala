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

  test("unprovable WHERE shapes read unpruned but value-correct") {
    import graft.plans.LakehouseSql
    // OR blocks pruning; the result must still be right
    val got = sql("SELECT k FROM graft_iceberg.lksql_pr " +
      "WHERE p = 'A' OR p = 'B' ORDER BY k").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 5L, 6L))
    assert(LakehouseSql.lastScans.isEmpty, "OR must not record a prune")
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
    intercept[Exception] {
      sql("UPDATE graft_delta.lksql_upd SET v = 0 WHERE k = 999")
    }
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
    sql("CREATE OR REPLACE TABLE graft_paimon.lksql_ow " +
      "PRIMARY KEY (p, k) PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
    val e = intercept[Exception] {
      sql("INSERT OVERWRITE graft_paimon.lksql_ow SELECT * FROM lksql_ow_new")
    }
    assert(e.getMessage.contains("not supported"))
    // timestamp travel: delta v0 stamp resolves; hudi is loud
    assert(sql("SELECT count(*) AS n FROM graft_delta.lksql_ow " +
      "FOR TIMESTAMP AS OF 1700000000000").head().getLong(0) == 2L)
    sql("CREATE OR REPLACE TABLE graft_hudi.lksql_owh " +
      "PRIMARY KEY (k) PARTITIONED BY (p) AS SELECT * FROM lksql_ow_src")
    val e2 = intercept[Exception] {
      sql("SELECT * FROM graft_hudi.lksql_owh " +
        "FOR TIMESTAMP AS OF 1700000000000").collect()
    }
    assert(e2.getMessage.contains("not supported"))
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
