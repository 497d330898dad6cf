package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-13 (late): closing the round's own "known remaining scope"
  * list — Hudi conditional MERGE as ONE atomic deltacommit (delete
  * blocks + data blocks share the instant, the way real Hudi's merge
  * commits once), a real Paimon level-merge compaction behind OPTIMIZE,
  * DML pruning on multi-field Iceberg specs, and type-widening schema
  * evolution (`ALTER COLUMN ... TYPE`) — Spark 4's parquet readers
  * up-cast narrower physical types natively, so widening is
  * metadata-only like the reference's light-weight schema change
  * (`fe/fe-core/.../alter/SchemaChangeHandler.java` LIGHT_SCHEMA_CHANGE
  * path). Oracles recompute expected content from the base tables. */
object Round13bQueries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  private def lakeDir(s: SparkSession): String =
    s.conf.getOption("spark.graft.lakehouse.dir").getOrElse("target/lakehouse")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // CONDITIONAL MERGE ON HUDI IS ONE INSTANT: matched %10=0 keys
    // update, matched %10=5 keys delete, even new keys insert — and the
    // timeline gains exactly ONE .deltacommit (delete blocks + data
    // blocks share it). The premise pins the atomicity fix: the old
    // spelling spent two instants, leaving a deletes-without-updates
    // window.
    "sql_lake_merge_cond_hudi" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_mch")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_hudi.mch_$n " +
        "PRIMARY KEY (o_orderkey) PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r13b_ord_mch")
      s.sql(
        """SELECT o_orderkey, o_custkey, o_orderstatus
          |FROM r13b_ord_mch WHERE o_orderkey % 5 = 0
          |UNION ALL
          |SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus
          |FROM range(90001, 90041)""".stripMargin)
        .createOrReplaceTempView("r13b_mch_src")
      val tblDir = s"${lakeDir(s)}/hudi/mch_$n"
      def instants: Int = Option(
        new java.io.File(tblDir, ".hoodie").list()).getOrElse(Array.empty)
        .count(f => f.endsWith(".commit") || f.endsWith(".deltacommit") ||
          f.endsWith(".replacecommit"))
      val before = instants
      s.sql(s"MERGE INTO graft_hudi.mch_$n t USING r13b_mch_src src " +
        "ON t.o_orderkey = src.o_orderkey " +
        "WHEN MATCHED AND src.o_orderkey % 10 = 0 THEN " +
        "UPDATE SET o_custkey = src.o_custkey + 1000000 " +
        "WHEN MATCHED AND src.o_orderkey % 10 = 5 THEN DELETE " +
        "WHEN NOT MATCHED AND src.o_orderkey % 2 = 0 THEN INSERT *")
      require(instants == before + 1,
        "atomicity premise: a conditional MERGE with update AND delete " +
          s"clauses must land ONE hudi instant, got ${instants - before}")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_hudi.mch_$n GROUP BY 1 ORDER BY 1")
    }),

    // PAIMON FULL COMPACTION behind OPTIMIZE: upsert + delete build
    // multi-file LSM buckets, OPTIMIZE merges each bucket into one
    // max-level file in ONE COMPACT snapshot, VACUUM RETAIN 1 VERSIONS
    // physically reclaims the superseded inputs — and the read is
    // byte-identical before/after (premise-gated both ways).
    "sql_lake_maintenance_paimon" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_mp")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.mp_$n " +
        "PRIMARY KEY (o_orderstatus, o_orderkey) " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13b_ord_mp")
      // upsert wave: %10=0 keys carry +1e6 custkey
      s.sql(s"INSERT INTO graft_paimon.mp_$n " +
        "SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_orderstatus " +
        "FROM r13b_ord_mp WHERE o_orderkey % 10 = 0")
      s.sql(s"DELETE FROM graft_paimon.mp_$n WHERE o_orderkey % 10 = 5")
      val tblDir = new java.io.File(s"${lakeDir(s)}/paimon/mp_$n").getAbsolutePath
      val pre = graft.ops.PaimonLite.planFiles(tblDir)
      require(pre.groupBy(f => (f.part, f.bucket)).exists(_._2.size > 1),
        "compaction premise: some LSM bucket must hold >1 file pre-OPTIMIZE")
      s.sql(s"OPTIMIZE graft_paimon.mp_$n")
      val post = graft.ops.PaimonLite.planFiles(tblDir)
      require(post.groupBy(f => (f.part, f.bucket)).forall(_._2.size == 1),
        "full compaction must leave exactly one file per bucket")
      val reclaimed = s.sql(s"VACUUM graft_paimon.mp_$n RETAIN 1 VERSIONS")
        .head().getLong(0)
      require(reclaimed > 0,
        "reclaim premise: vacuum after compaction must delete superseded files")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_paimon.mp_$n GROUP BY 1 ORDER BY 1")
    }),

    // DML PRUNING ON A MULTI-FIELD SPEC: UPDATE by the bucket component
    // and DELETE by a day-component range each plan a strict file
    // subset (premise-gated via lastScans) — at 100 TB a key-scoped
    // UPDATE must not open every partition's footers. The replacement
    // rows land back under the table's own spec.
    "sql_lake_update_multispec" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "events")
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .createOrReplaceTempView("r13b_ev_um")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.um_$n " +
        "PARTITIONED BY (days(ts), bucket(8, event_id)) " +
        "AS SELECT * FROM r13b_ev_um")
      s.sql(s"UPDATE graft_iceberg.um_$n SET event_type = 'UPD' " +
        "WHERE event_id = 77")
      val uScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: UPDATE must record a pruned scan"))
      require(uScan.plannedFiles >= 1 && uScan.plannedFiles * 2 <= uScan.totalFiles,
        s"premise: bucket-component UPDATE must plan a strict subset, got $uScan")
      s.sql(s"DELETE FROM graft_iceberg.um_$n " +
        "WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' " +
        "AND ts < TIMESTAMP '2024-01-08 00:00:00'")
      val dScan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: DELETE must record a pruned scan"))
      require(dScan.plannedFiles >= 1 && dScan.plannedFiles * 2 <= dScan.totalFiles,
        s"premise: day-component DELETE must plan a strict subset, got $dScan")
      s.sql(s"SELECT event_type, count(*) AS cnt, " +
        "CAST(sum(event_id) AS BIGINT) AS sum_id " +
        s"FROM graft_iceberg.um_$n GROUP BY 1 ORDER BY 1")
    }),

    // TYPE WIDENING ×4 (ALTER COLUMN ... TYPE BIGINT): metadata-only —
    // pre-widening parquet up-casts natively at scan, hudi log blocks
    // coerce at decode (the pre-widen upsert wave seeds them), and a
    // post-widen INSERT carries values only BIGINT can hold.
    "sql_lake_widen_column" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_custkey").cast("int").as("ck"))
        .createOrReplaceTempView("r13b_ord_wd")
      val n = safeName(dir)
      Seq("delta", "hudi", "iceberg", "paimon").map { fmt =>
        val pk = fmt match {
          case "hudi" => "PRIMARY KEY (o_orderkey) "
          case "paimon" => "PRIMARY KEY (o_orderstatus, o_orderkey) "
          case _ => ""
        }
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.wd_$n $pk" +
          "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13b_ord_wd")
        if (fmt == "hudi")
          // log blocks carrying the NARROW int — the decode-coercion leg
          s.sql(s"INSERT INTO graft_hudi.wd_$n " +
            "SELECT o_orderkey, o_orderstatus, ck + 1000000 AS ck " +
            "FROM r13b_ord_wd WHERE o_orderkey % 10 = 0")
        s.sql(s"ALTER TABLE graft_$fmt.wd_$n ALTER COLUMN ck TYPE BIGINT")
        s.sql(s"INSERT INTO graft_$fmt.wd_$n " +
          "SELECT id AS o_orderkey, 'O' AS o_orderstatus, " +
          "CAST(10000000000 AS BIGINT) + id AS ck FROM range(90001, 90011)")
        s.sql(s"SELECT '$fmt' AS fmt, o_orderstatus, count(*) AS n2, " +
          s"CAST(sum(ck) AS BIGINT) AS sum_ck FROM graft_$fmt.wd_$n " +
          "GROUP BY 1, 2")
      }.reduce(_ unionByName _).orderBy(col("fmt"), col("o_orderstatus"))
    }),

    // SHOW PARTITIONS / SHOW CREATE TABLE: metadata-only introspection.
    // The partition list is oracle-checked against DISTINCT values; the
    // reconstructed CREATE statement and per-partition file counts are
    // premise-gated in-fixture (they embed engine-side facts DuckDB
    // cannot see).
    "sql_lake_show_meta" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_sm")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.sm_$n " +
        "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r13b_ord_sm")
      val stmt = s.sql(s"SHOW CREATE TABLE graft_delta.sm_$n").head().getString(0)
      require(stmt == s"CREATE TABLE graft_delta.sm_$n (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING) PARTITIONED BY (o_orderstatus)",
        s"premise: SHOW CREATE TABLE must reconstruct the statement, got: $stmt")
      val out = s.sql(s"SHOW PARTITIONS graft_delta.sm_$n")
      require(out.collect().forall(_.getInt(1) >= 1),
        "premise: every partition holds at least one live file")
      out.select(col("partition")).orderBy(col("partition"))
    }),

    // THE EMPTY-TABLE LIFECYCLE ×4 (standard DDL): CREATE TABLE (cols)
    // with no AS SELECT → empty declared-schema read → INSERT odd keys
    // → TRUNCATE (one atomic commit, zero rows, schema survives) →
    // INSERT even keys. Premise-gated emptiness both times; the final
    // content is exactly the even half on every format.
    "sql_lake_empty_lifecycle" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_el")
      val n = safeName(dir)
      Seq("delta", "hudi", "iceberg", "paimon").map { fmt =>
        val pk = fmt match {
          case "hudi" => "PRIMARY KEY (o_orderkey) "
          case "paimon" => "PRIMARY KEY (o_orderstatus, o_orderkey) "
          case _ => ""
        }
        s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.el_$n " +
          "(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING) " +
          s"${pk}PARTITIONED BY (o_orderstatus)")
        require(s.sql(s"SELECT * FROM graft_$fmt.el_$n").count() == 0,
          s"premise: created-empty $fmt table must read zero rows")
        s.sql(s"INSERT INTO graft_$fmt.el_$n " +
          "SELECT * FROM r13b_ord_el WHERE o_orderkey % 2 = 1")
        s.sql(s"TRUNCATE TABLE graft_$fmt.el_$n")
        require(s.sql(s"SELECT * FROM graft_$fmt.el_$n").limit(1).count() == 0,
          s"premise: truncated $fmt table must read zero rows")
        s.sql(s"INSERT INTO graft_$fmt.el_$n " +
          "SELECT * FROM r13b_ord_el WHERE o_orderkey % 2 = 0")
        s.sql(s"SELECT '$fmt' AS fmt, o_orderstatus, count(*) AS n2, " +
          s"CAST(sum(o_custkey) AS BIGINT) AS sum_ck FROM graft_$fmt.el_$n " +
          "GROUP BY 1, 2")
      }.reduce(_ unionByName _).orderBy(col("fmt"), col("o_orderstatus"))
    }),

    // TABLE STREAM OVER THE EMPTY-TABLE LIFECYCLE: a stream created on
    // a CREATED-EMPTY table ships the first insert window, and a
    // TRUNCATE window ships every live row as a delete (the Delta CDC
    // feed derives them from the removes-only commit's dataChange
    // markers) — the aggregate of the delete window equals the
    // pre-truncate content.
    "sql_lake_stream_truncate" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_st")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.st_$n " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING) " +
        "PARTITIONED BY (o_orderstatus)")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        s"${lakeDir(s)}/_streams/sts_$n.json")): Unit
      s.sql(s"CREATE STREAM graft_stream.sts_$n ON TABLE graft_delta.st_$n")
      require(s.sql(s"SELECT * FROM graft_stream.sts_$n").count() == 0,
        "premise: a stream on a created-empty table starts empty")
      s.sql(s"INSERT INTO graft_delta.st_$n SELECT * FROM r13b_ord_st")
      val ins = s.sql(s"SELECT count(*) AS n FROM graft_stream.sts_$n " +
        "WHERE _CHANGE_TYPE = 'insert'").head().getLong(0)
      require(ins > 0, "premise: the insert window must ship")
      s.sql(s"TRUNCATE TABLE graft_delta.st_$n")
      // the truncate window: every pre-truncate row rides as a delete
      s.sql(s"SELECT o_orderstatus, _CHANGE_TYPE, count(*) AS n2, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_stream.sts_$n GROUP BY 1, 2 ORDER BY 1, 2")
    }),

    // COLUMN-SUBSET INSERT + EXCLUSION PRUNING: INSERT INTO t (cols)
    // binds positionally and null-fills the rest; the final read's
    // `o_orderstatus <> 'P'` plans a strict file subset (the excluded
    // partition pruned — premise-gated).
    "sql_lake_insert_cols" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r13b_ord_ic")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.ic_$n " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
        "note STRING) PARTITIONED BY (o_orderstatus)")
      s.sql(s"INSERT INTO graft_delta.ic_$n " +
        "(o_orderkey, o_custkey, o_orderstatus) " +
        "SELECT * FROM r13b_ord_ic WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_delta.ic_$n " +
        "(o_orderstatus, o_orderkey, note) " +
        "SELECT o_orderstatus, o_orderkey, 'odd' FROM r13b_ord_ic " +
        "WHERE o_orderkey % 2 = 1")
      val out = s.sql(s"SELECT o_orderstatus, count(*) AS n2, " +
        "CAST(sum(coalesce(o_custkey, 0)) AS BIGINT) AS sum_ck, " +
        "count(note) AS n_note " +
        s"FROM graft_delta.ic_$n WHERE o_orderstatus <> 'P' " +
        "GROUP BY 1 ORDER BY 1")
      out.collect(): Unit
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("premise: the exclusion read must record a scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"premise: <> must prune the excluded partition, got $scan")
      out
    }),
  )

  def oracle: Map[String, String] = Map(

    // %10=0 matched keys carry +1e6; %10=5 matched keys are gone; even
    // synthetic keys inserted (the sql_lake_merge_cond shape on hudi)
    "sql_lake_merge_cond_hudi" -> """
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

    // %10=0 upserted with +1e6, %10=5 deleted; compaction + vacuum are
    // state motion — the aggregate must not see them
    "sql_lake_maintenance_paimon" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000 AND o_orderkey % 10 <> 5) u
      GROUP BY 1 ORDER BY 1""",

    // event_id=77 re-typed 'UPD'; the Jan 5-7 day window deleted
    "sql_lake_update_multispec" -> """
      SELECT CASE WHEN event_id = 77 THEN 'UPD' ELSE event_type END
               AS event_type,
             count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS sum_id
      FROM events
      WHERE NOT (ts >= TIMESTAMP '2024-01-05 00:00:00'
                 AND ts < TIMESTAMP '2024-01-08 00:00:00')
      GROUP BY 1 ORDER BY 1""",

    // per format: the base rows (hudi's %10=0 keys upserted +1e6) plus
    // ten 'O'-status rows holding BIGINT-only values
    "sql_lake_widen_column" -> """
      SELECT fmt, o_orderstatus, count(*) AS n2,
             CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (
        SELECT f.fmt, o.o_orderstatus,
               CASE WHEN f.fmt = 'hudi' AND o.o_orderkey % 10 = 0
                    THEN o.o_custkey + 1000000 ELSE o.o_custkey END AS ck
        FROM orders o
        CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f
        WHERE o.o_orderkey < 9000
        UNION ALL
        SELECT f.fmt, 'O' AS o_orderstatus, 10000000000 + r AS ck
        FROM range(90001, 90011) t(r)
        CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f
      ) u
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // the stored partition values are the distinct status strings
    "sql_lake_show_meta" -> """
      SELECT DISTINCT o_orderstatus AS partition
      FROM orders WHERE o_orderkey < 9000 ORDER BY 1""",

    // every pre-truncate row rides the delete window
    "sql_lake_stream_truncate" -> """
      SELECT o_orderstatus, 'delete' AS _CHANGE_TYPE, count(*) AS n2,
             CAST(sum(o_custkey) AS BIGINT) AS sum_ck
      FROM orders WHERE o_orderkey < 9000
      GROUP BY 1, 2 ORDER BY 1, 2""",

    // evens carry custkey (subset insert), odds carry the note; the 'P'
    // partition is excluded
    "sql_lake_insert_cols" -> """
      SELECT o_orderstatus, count(*) AS n2,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN o_custkey ELSE 0 END)
                  AS BIGINT) AS sum_ck,
             count(CASE WHEN o_orderkey % 2 = 1 THEN 1 END) AS n_note
      FROM orders
      WHERE o_orderkey < 9000 AND o_orderstatus <> 'P'
      GROUP BY 1 ORDER BY 1""",

    // the odd keys truncated away; the even half survives on each format
    "sql_lake_empty_lifecycle" -> """
      SELECT f.fmt, o.o_orderstatus, count(*) AS n2,
             CAST(sum(o.o_custkey) AS BIGINT) AS sum_ck
      FROM orders o
      CROSS JOIN (SELECT unnest(['delta','hudi','iceberg','paimon']) AS fmt) f
      WHERE o.o_orderkey < 9000 AND o.o_orderkey % 2 = 0
      GROUP BY 1, 2 ORDER BY 1, 2""",
  )
}
