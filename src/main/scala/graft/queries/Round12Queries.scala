package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-12: the SQL lakehouse route grows the plan quality and verbs a
  * real user hits first — WHERE partition conjuncts reaching FILE-level
  * planning (plans/SqlPrune.scala; reference
  * fe/fe-core/.../nereids/rules/rewrite/PruneFileScanPartition.java),
  * MERGE INTO / UPDATE over the existing upsert/delete writers
  * (reference be/src/exec/operator/iceberg_merge_sink_operator.h:44),
  * write-side Iceberg partition transforms, bounded append retries for
  * Paimon/Hudi, ADD COLUMN schema evolution across all four formats,
  * and the change feeds surfaced as streaming sources. Oracles
  * recompute expected content from the base tables by predicate —
  * non-circular as always. */
object Round12Queries {

  private def safeName(dir: String): String =
    new java.io.File(dir).getName.replace(".", "_")

  /** CREATE (orders subset) → ALTER ADD COLUMN extra BIGINT → INSERT
    * synthetic keys carrying it → aggregate; shared by the four
    * `src_<fmt>_add_column` keys (same oracle shape). */
  private def addColumnRoundTrip(s: SparkSession, dir: String,
                                 fmt: String, pk: String): DataFrame = {
    t(s, dir, "orders").filter(col("o_orderkey") < 12000)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .createOrReplaceTempView("r12_ord")
    val n = safeName(dir)
    s.sql(s"CREATE OR REPLACE TABLE graft_$fmt.ac_$n $pk " +
      "PARTITIONED BY (o_orderstatus) AS SELECT * FROM r12_ord")
    s.sql(s"ALTER TABLE graft_$fmt.ac_$n ADD COLUMN extra BIGINT")
    s.sql(s"INSERT INTO graft_$fmt.ac_$n " +
      "SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus, " +
      "id * 2 AS extra FROM range(90001, 90021)")
    s.sql(
      s"""SELECT o_orderstatus, count(*) AS cnt,
         |       count(extra) AS n_extra,
         |       CAST(sum(coalesce(extra, 0)) AS BIGINT) AS sum_extra
         |FROM graft_$fmt.ac_$n GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SQL-ROUTE FILE PRUNING: the WHERE's partition conjunct must reach
    // the Iceberg manifest walk — the premise gate asserts a STRICT
    // file subset was planned (1 partition of 3), through pure SQL.
    // Value-exactness comes from the oracle recomputing the same
    // predicate over the base table.
    "sql_lake_prune" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r12_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.pr_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r12_li")
      val out = s.sql(
        s"""SELECT l_returnflag, count(*) AS cnt,
           |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM graft_iceberg.pr_$n
           |WHERE l_returnflag = 'A' AND l_orderkey % 2 = 0
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("prune premise: the read must record a pruned scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"prune premise: WHERE l_returnflag='A' must plan a strict file " +
          s"subset, got $scan")
      out
    }),

    // and the Delta spelling: partitionValues-level pruning plus the
    // deletion-vector read path composing with it (delete some rows
    // first, then the pruned aggregate)
    "sql_lake_prune_delta" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r12_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.prd_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r12_li")
      s.sql(s"DELETE FROM graft_delta.prd_$n WHERE l_orderkey % 3 = 0")
      val out = s.sql(
        s"""SELECT l_returnflag, count(*) AS cnt,
           |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
           |FROM graft_delta.prd_$n
           |WHERE l_returnflag IN ('N', 'R')
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("prune premise: the read must record a pruned scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"prune premise: IN ('N','R') must plan a strict file subset: $scan")
      out
    }),

    // WRITE-SIDE BUCKET TRANSFORM: the table is CREATED with bucket[8]
    // on the key (spec murmur3, native codegen expression); a
    // key-equality read computes the key's bucket and plans ONLY that
    // bucket's files — the hash-partition analog of the reference's
    // tablet prune (PruneOlapScanTablet.java), now closed write-to-read
    "src_iceberg_write_bucket" -> ((s, dir) => {
      import graft.ops.{IcebergLite, IcebergWriter}
      val src = t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val tableDir = new java.io.File(
        s"target/iceberg/wbucket_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      IcebergWriter.append(s, tableDir, src, partCol = Some("l_orderkey"),
        partTransform = "bucket[8]")
      val key = 1L
      val want = IcebergLite.bucketLong(key, 8).toString
      val prune = Some(("l_orderkey", "bucket[8]", (pv: String) => pv == want))
      val planned = IcebergLite.planFiles(tableDir, transformPrune = prune)
        .count(_.content == 0)
      val total = IcebergLite.planFiles(tableDir).count(_.content == 0)
      require(planned >= 1 && planned < total,
        s"bucket prune premise: $planned of $total files")
      IcebergLite.readSnapshot(s, tableDir, transformPrune = prune)
        .filter(col("l_orderkey") === key)
        .select(col("l_linenumber"), col("l_quantity").cast("bigint").as("qty"))
        .orderBy(col("l_linenumber"))
    }),

    // CONCURRENT PAIMON APPENDS: writer B commits between writer A's
    // snapshot-id resolution and CAS; the key sets are disjoint, so A
    // validates and retries onto the next id — the read is the union
    // of all three commits (a lost update would drop a residue class)
    "src_paimon_concurrent" -> ((s, dir) => {
      import graft.ops.{PaimonLite, PaimonWriter}
      val src = t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
      val tableDir = new java.io.File(
        s"target/paimon/conc_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      val keys = Seq("o_orderstatus", "o_orderkey")
      PaimonWriter.append(s, tableDir,
        src.filter(col("o_orderkey") % 2 === 0), "o_orderstatus", keys): Unit
      val id = PaimonWriter.append(s, tableDir,
        src.filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 3 =!= 0),
        "o_orderstatus", keys,
        beforeCommit = () => {
          PaimonWriter.append(s, tableDir,
            src.filter(col("o_orderkey") % 2 === 1 && col("o_orderkey") % 3 === 0),
            "o_orderstatus", keys): Unit
        })
      require(id == 3L, s"concurrency premise: loser retries onto 3, got $id")
      PaimonLite.readSnapshot(s, tableDir, keys)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // CONCURRENT HUDI UPSERTS: the loser re-stages its delta commit
    // against the winner's timeline (key→file-group index re-resolved)
    // and lands on the next instant
    "src_hudi_concurrent" -> ((s, dir) => {
      import graft.ops.HudiLite
      val src = t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      val tableDir = new java.io.File(
        s"target/hudi/conc_${new java.io.File(dir).getName}").getAbsolutePath
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tableDir))
      HudiLite.createTable(s, tableDir, src,
        keyCols = Seq("o_orderkey"), partCol = "o_orderstatus", instant = "001")
      val waveA = src.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_custkey", col("o_custkey") + 1000000L)
      val waveB = src.filter(col("o_orderkey") % 10 === 1)
        .withColumn("o_custkey", col("o_custkey") + 2000000L)
      require(waveA.limit(1).count() == 1 && waveB.limit(1).count() == 1,
        "concurrency premise: both waves non-empty")
      HudiLite.upsert(s, tableDir, waveA,
        Seq("o_orderkey"), "o_orderstatus", "002",
        beforeCommit = () => {
          HudiLite.upsert(s, tableDir, waveB,
            Seq("o_orderkey"), "o_orderstatus", "002"): Unit
        }): Unit
      require(new java.io.File(tableDir, ".hoodie/003.deltacommit").exists(),
        "concurrency premise: the retried loser lands on instant 003")
      HudiLite.readSnapshotMor(s, tableDir, Seq("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("o_custkey")).as("sum_ck"))
        .orderBy(col("o_orderstatus"))
    }),

    // ADD COLUMN schema evolution, all four formats, driven through
    // the SQL route: CREATE → ALTER TABLE ADD COLUMN → INSERT rows
    // CARRYING the column → read. Pre-evolution rows must read the
    // column as NULL (no data movement: Delta metaData commit, Iceberg
    // schemas array, Paimon schema-N file, Hudi schema declaration).
    "src_delta_add_column" -> ((s, dir) =>
      addColumnRoundTrip(s, dir, "delta", "")),
    "src_iceberg_add_column" -> ((s, dir) =>
      addColumnRoundTrip(s, dir, "iceberg", "")),
    "src_hudi_add_column" -> ((s, dir) =>
      addColumnRoundTrip(s, dir, "hudi", "PRIMARY KEY (o_orderkey)")),
    "src_paimon_add_column" -> ((s, dir) =>
      addColumnRoundTrip(s, dir, "paimon",
        "PRIMARY KEY (o_orderstatus, o_orderkey)")),

    // SQL TABLE STREAM: CREATE STREAM graft_stream.s ON TABLE t gives
    // a named cursor over the table's change feed; each SELECT FROM
    // the stream consumes (cursor, current] and advances it — two
    // consumption cycles here, with an emptiness premise between
    // (reference catalog/stream/OlapTableStream.java, table_stream_p0/)
    "sql_lake_stream" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r12_ord_ts")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.ts_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r12_ord_ts WHERE o_orderkey % 2 = 0")
      // fresh stream per run (CREATE STREAM refuses to clobber)
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        s.conf.getOption("spark.graft.lakehouse.dir")
          .getOrElse("target/lakehouse") + s"/_streams/s_$n.json")): Unit
      s.sql(s"CREATE STREAM graft_stream.s_$n ON TABLE graft_delta.ts_$n")
      // cycle 1: the odd-key insert window
      s.sql(s"INSERT INTO graft_delta.ts_$n " +
        "SELECT * FROM r12_ord_ts WHERE o_orderkey % 2 = 1")
      val c1 = s.sql(s"SELECT o_orderstatus, _CHANGE_TYPE, o_orderkey " +
        s"FROM graft_stream.s_$n")
      val c1rows = c1.cache().count()
      require(c1rows > 0, "stream premise: cycle 1 must ship the insert window")
      // consumed: an unchanged table yields an EMPTY window
      require(s.sql(s"SELECT * FROM graft_stream.s_$n").limit(1).count() == 0,
        "stream premise: a consumed stream with no new commits is empty")
      // cycle 2: the delete window
      s.sql(s"DELETE FROM graft_delta.ts_$n WHERE o_orderkey % 9 = 0")
      val c2 = s.sql(s"SELECT o_orderstatus, _CHANGE_TYPE, o_orderkey " +
        s"FROM graft_stream.s_$n")
      c1.unionByName(c2)
        .groupBy(col("o_orderstatus"), col("_CHANGE_TYPE").as("change_type"))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sum_ok"))
        .orderBy(col("o_orderstatus"), col("change_type"))
    }),

    // INSERT OVERWRITE: one atomic replace commit (Delta removes+adds
    // in a single commit; a reader sees old or new, never a mix) —
    // the premise pins the single-version atomicity
    "sql_lake_overwrite" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r12_ord_ow")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.ow_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r12_ord_ow WHERE o_orderkey % 2 = 0")
      val v = s.sql(s"INSERT OVERWRITE graft_delta.ow_$n " +
        "SELECT * FROM r12_ord_ow WHERE o_orderkey % 3 = 0").head().getLong(0)
      require(v == 1L, s"overwrite premise: ONE commit after create, got $v")
      // the pre-overwrite state still time travels
      require(s.sql(s"SELECT count(*) FROM graft_delta.ow_$n " +
        "FOR VERSION AS OF 0 WHERE o_orderkey % 2 <> 0").head().getLong(0) == 0L,
        "overwrite premise: v0 is the even half")
      s.sql(s"SELECT o_orderstatus, count(*) AS cnt, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_ok " +
        s"FROM graft_delta.ow_$n GROUP BY 1 ORDER BY 1")
    }),

    // TIMESTAMP time travel through SQL — deterministic commit stamps
    // (1700000000000 + version/snapshot) make the coordinates exact:
    // delta at its v0 stamp, paimon at its snapshot-1 stamp, both next
    // to the current state in one statement
    "sql_lake_travel_ts" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_custkey"))
        .createOrReplaceTempView("r12_ord_ts2")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.tts_$n " +
        "PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r12_ord_ts2 WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_delta.tts_$n " +
        "SELECT * FROM r12_ord_ts2 WHERE o_orderkey % 2 = 1")
      s.sql(s"CREATE OR REPLACE TABLE graft_paimon.tts_$n " +
        "PRIMARY KEY (o_orderstatus, o_orderkey) PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r12_ord_ts2 WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO graft_paimon.tts_$n " +
        "SELECT * FROM r12_ord_ts2 WHERE o_orderkey % 2 = 1")
      s.sql(
        s"""SELECT cur.o_orderstatus, cur.n AS n_cur,
           |       coalesce(d0.n, 0) AS n_delta_t0,
           |       coalesce(p1.n, 0) AS n_paimon_t1
           |FROM (SELECT o_orderstatus, count(*) AS n
           |      FROM graft_delta.tts_$n GROUP BY 1) cur
           |LEFT JOIN (SELECT o_orderstatus, count(*) AS n
           |           FROM graft_delta.tts_$n FOR TIMESTAMP AS OF 1700000000000
           |           GROUP BY 1) d0 ON cur.o_orderstatus = d0.o_orderstatus
           |LEFT JOIN (SELECT o_orderstatus, count(*) AS n
           |           FROM graft_paimon.tts_$n FOR TIMESTAMP AS OF 1700000000001
           |           GROUP BY 1) p1 ON cur.o_orderstatus = p1.o_orderstatus
           |ORDER BY cur.o_orderstatus""".stripMargin)
    }),

    // PARTITION TRANSFORM THROUGH SQL: CREATE ... PARTITIONED BY
    // (bucket(8, o_orderkey)) stamps the spec transform; a key-equality
    // WHERE prunes to the key's bucket file — transforms usable
    // end-to-end from SQL, write to read
    "sql_lake_prune_bucket" -> ((s, dir) => {
      import graft.plans.LakehouseSql
      t(s, dir, "orders").filter(col("o_orderkey") < 9000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r12_ord_bk")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.bk_$n " +
        "PARTITIONED BY (bucket(8, o_orderkey)) AS SELECT * FROM r12_ord_bk")
      val out = s.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus " +
        s"FROM graft_iceberg.bk_$n WHERE o_orderkey = 7 ORDER BY o_orderkey")
      val scan = LakehouseSql.lastScans.headOption.getOrElse(
        sys.error("bucket prune premise: the read must record a pruned scan"))
      require(scan.plannedFiles >= 1 && scan.plannedFiles < scan.totalFiles,
        s"bucket prune premise: key equality must plan a strict file " +
          s"subset, got $scan")
      out
    }),

    // SQL UPDATE on the Delta route: the matched rows re-land updated
    // through a deletion-vector commit + append — no data rewrite of
    // the untouched rows, the protocol's row-change shape
    "sql_lake_update" -> ((s, dir) => {
      t(s, dir, "lineitem").filter(col("l_orderkey") < 10000)
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        .createOrReplaceTempView("r12_li")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_delta.upd_$n " +
        "PARTITIONED BY (l_returnflag) AS SELECT * FROM r12_li")
      s.sql(s"UPDATE graft_delta.upd_$n SET l_quantity = l_quantity + 100 " +
        "WHERE l_orderkey % 4 = 0")
      s.sql(s"SELECT l_returnflag, count(*) AS cnt, " +
        "CAST(sum(l_quantity) AS BIGINT) AS sum_qty " +
        s"FROM graft_delta.upd_$n GROUP BY 1 ORDER BY 1")
    }),

    // SQL MERGE INTO on an Iceberg PRIMARY KEY table: matched updates
    // + not-matched inserts land as ONE upsert commit (equality deletes
    // + new data files — the merge-on-write shape of the reference's
    // iceberg merge sink)
    "sql_lake_merge" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 12000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .createOrReplaceTempView("r12_ord")
      val n = safeName(dir)
      s.sql(s"CREATE OR REPLACE TABLE graft_iceberg.mrg_$n " +
        "PRIMARY KEY (o_orderkey) PARTITIONED BY (o_orderstatus) " +
        "AS SELECT * FROM r12_ord")
      s.sql(
        """SELECT o_orderkey, o_custkey + 1000000 AS o_custkey,
          |       o_orderstatus
          |FROM r12_ord WHERE o_orderkey % 10 = 0
          |UNION ALL
          |SELECT id AS o_orderkey, id AS o_custkey, 'O' AS o_orderstatus
          |FROM range(90001, 90021)""".stripMargin)
        .createOrReplaceTempView("r12_mrg_src")
      s.sql(s"MERGE INTO graft_iceberg.mrg_$n t USING r12_mrg_src src " +
        "ON t.o_orderkey = src.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET o_custkey = src.o_custkey " +
        "WHEN NOT MATCHED THEN INSERT *")
      s.sql(s"SELECT o_orderstatus, count(*) AS n, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck " +
        s"FROM graft_iceberg.mrg_$n GROUP BY 1 ORDER BY 1")
    })
  )

  /** Base rows read the evolved column as NULL; the inserted synthetic
    * keys carry it. */
  private val AddColumnOracle = """
    SELECT o_orderstatus, count(*) AS cnt,
           count(extra) AS n_extra,
           CAST(sum(coalesce(extra, 0)) AS BIGINT) AS sum_extra
    FROM (SELECT o_orderstatus, CAST(NULL AS BIGINT) AS extra
          FROM orders WHERE o_orderkey < 12000
          UNION ALL
          SELECT 'O' AS o_orderstatus, r * 2 AS extra
          FROM range(90001, 90021) t(r)) u
    GROUP BY 1 ORDER BY 1"""

  def oracle: Map[String, String] = Map(

    "sql_lake_prune" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_returnflag = 'A' AND l_orderkey % 2 = 0
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_prune_delta" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000 AND l_orderkey % 3 <> 0
        AND l_returnflag IN ('N', 'R')
      GROUP BY 1 ORDER BY 1""",

    "src_paimon_concurrent" -> """
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 12000
      GROUP BY 1 ORDER BY 1""",

    "src_hudi_concurrent" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        WHEN o_orderkey % 10 = 1 THEN o_custkey + 2000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000) u
      GROUP BY 1 ORDER BY 1""",

    "src_delta_add_column" -> AddColumnOracle,
    "src_iceberg_add_column" -> AddColumnOracle,
    "src_hudi_add_column" -> AddColumnOracle,
    "src_paimon_add_column" -> AddColumnOracle,

    "src_iceberg_write_bucket" -> """
      SELECT l_linenumber, CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
      WHERE l_orderkey = 1
      ORDER BY l_linenumber""",

    // cycle 1 = odd-key inserts; cycle 2 = deletes of every live %9
    // key (both parities — evens predate the stream but their deletes
    // are post-cursor changes)
    "sql_lake_stream" -> """
      SELECT o_orderstatus, ct AS change_type, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM (SELECT o_orderstatus, 'insert' AS ct, o_orderkey
            FROM orders WHERE o_orderkey < 9000 AND o_orderkey % 2 = 1
            UNION ALL
            SELECT o_orderstatus, 'delete' AS ct, o_orderkey
            FROM orders WHERE o_orderkey < 9000 AND o_orderkey % 9 = 0) u
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "sql_lake_prune_bucket" -> """
      SELECT o_orderkey, o_custkey, o_orderstatus
      FROM orders
      WHERE o_orderkey = 7
      ORDER BY o_orderkey""",

    "sql_lake_overwrite" -> """
      SELECT o_orderstatus, count(*) AS cnt,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_ok
      FROM orders
      WHERE o_orderkey < 9000 AND o_orderkey % 3 = 0
      GROUP BY 1 ORDER BY 1""",

    // both travel targets are the even half; current is everything
    "sql_lake_travel_ts" -> """
      SELECT o_orderstatus, count(*) AS n_cur,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_delta_t0,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_paimon_t1
      FROM orders
      WHERE o_orderkey < 9000
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_update" -> """
      SELECT l_returnflag, count(*) AS cnt,
             CAST(sum(CASE WHEN l_orderkey % 4 = 0 THEN l_quantity + 100
                           ELSE l_quantity END) AS BIGINT) AS sum_qty
      FROM lineitem
      WHERE l_orderkey < 10000
      GROUP BY 1 ORDER BY 1""",

    "sql_lake_merge" -> """
      SELECT o_orderstatus, count(*) AS n, CAST(sum(ck) AS BIGINT) AS sum_ck
      FROM (SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 10 = 0 THEN o_custkey + 1000000
                        ELSE o_custkey END AS ck
            FROM orders
            WHERE o_orderkey < 12000
            UNION ALL
            SELECT 'O' AS o_orderstatus, r AS ck
            FROM range(90001, 90021) t(r)) u
      GROUP BY 1 ORDER BY 1"""
  )
}
