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
  )
}
