package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Source/sink battery (SURVEY.md §2.1/§2.2; reference:
  * FileScanOperatorX file_scan_operator.h:98 with parquet/orc/csv/json
  * readers under be/src/format/; ResultFileSinkOperatorX
  * result_file_sink_operator.h:52 = INTO OUTFILE;
  * DataGenSourceOperatorX datagen_operator.h:51 = numbers() TVF;
  * SchemaScanOperatorX schema_scan_operator.h:57 = information_schema).
  *
  * Each format query round-trips a fixture through target/ in that
  * format and aggregates the re-read — the oracle aggregates the
  * original parquet, so a failed write OR read desyncs the hash.
  */
object SourceQueries {

  private def roundTrip(s: SparkSession, dir: String, fmt: String): DataFrame = {
    val out = s"target/sources/nation_$fmt"
    val n = t(s, dir, "nation")
    val w = n.write.mode("overwrite").format(fmt)
    (fmt match {
      case "csv" => w.option("header", "true")
      case "xml" => w.option("rowTag", "nation")
      case _ => w
    }).save(out)
    val r = s.read.format(fmt)
    (fmt match {
      case "csv" => r.option("header", "true").schema(n.schema)
      case "json" => r.schema(n.schema)
      case "xml" => r.option("rowTag", "nation").schema(n.schema)
      case _ => r
    }).load(out)
  }

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n"), sum(col("n_nationkey")).as("sk"),
        min(col("n_name")).as("mn"))
      .orderBy(col("n_regionkey"))

  private val oracleAgg = """
      SELECT n_regionkey, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS sk,
             min(n_name) AS mn
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_csv_roundtrip" -> ((s, dir) => agg(roundTrip(s, dir, "csv"))),
    "src_json_roundtrip" -> ((s, dir) => agg(roundTrip(s, dir, "json"))),
    "src_orc_roundtrip" -> ((s, dir) => agg(roundTrip(s, dir, "orc"))),

    // XML roundtrip through Spark 4's NATIVE xml data source (the
    // format a Wikipedia-dump ingest job reads; rowTag-scoped records,
    // schema-projected read).
    "src_xml_roundtrip" -> ((s, dir) => agg(roundTrip(s, dir, "xml"))),

    // Avro object-container roundtrip (ops/AvroSource.scala): REAL
    // container files — schema header, sync markers, deflate blocks —
    // via the core Avro runtime; read side is a distributed binaryFile
    // scan with one DataFileStream decoder per file. Split across 4
    // containers so the scan demonstrably parallelizes.
    "src_avro_roundtrip" -> ((s, dir) => {
      val out = "target/sources/nation_avro"
      graft.ops.AvroSource.writeNationAvro(t(s, dir, "nation"), out, 7)
      agg(graft.ops.AvroSource.readNationAvro(s, out))
    }),

    // INTO OUTFILE: write a query result, read it back.
    "src_outfile" -> ((s, dir) => {
      val out = "target/sources/outfile_topcust"
      t(s, dir, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    }),

    // numbers() TVF -> spark.range (datagen source).
    "src_numbers" -> ((s, dir) => {
      s.range(1, 10001)
        .select((col("id") % 7).as("bucket"), col("id"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        .orderBy(col("bucket"))
    }),

    // Hive-metastore catalog roundtrip (reference: HMS external catalog,
    // datasource/hive/HMSExternalCatalog.java): a managed table is
    // created THROUGH a genuine HiveExternalCatalog (embedded Derby HMS
    // — GraftSession pins spark.sql.catalogImplementation=hive), data
    // inserted, then read back via the catalog and aggregated. The
    // require guards against silently falling back to the in-memory
    // catalog, which would make this test vacuous.
    "src_hive_catalog_roundtrip" -> ((s, dir) => {
      val ext = s.sharedState.externalCatalog.unwrapped.getClass.getName
      require(ext.endsWith("HiveExternalCatalog"),
        s"expected a Hive metastore catalog, got $ext")
      s.sql("DROP TABLE IF EXISTS hive_nations")
      t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"), col("r_name"))
        .write.mode("overwrite").format("parquet").saveAsTable("hive_nations")
      require(s.sql("SHOW TABLES").collect()
        .exists(_.getString(1) == "hive_nations"), "HMS lost the table")
      s.table("hive_nations")
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), min(col("n_name")).as("mn"),
          max(col("n_name")).as("mx"))
        .orderBy(col("r_name"))
    }),

    // ANALYZE TABLE statistics collection (reference: FE stats jobs,
    // fe/fe-core/.../statistics/AnalysisManager.java + BE stats sampling;
    // feeds the CBO exactly like Doris's column stats feed Nereids).
    // The collected rowCount must round-trip through the HMS catalog
    // into the optimizer's Statistics — asserted in-query; the returned
    // rows are oracle-checked against direct counts.
    "src_analyze_stats" -> ((s, dir) => {
      import s.implicits._
      s.sql("DROP TABLE IF EXISTS hive_nation_stats")
      t(s, dir, "nation").write.format("parquet").saveAsTable("hive_nation_stats")
      s.sql("ANALYZE TABLE hive_nation_stats COMPUTE STATISTICS")
      s.sql("ANALYZE TABLE hive_nation_stats COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
      val stats = s.table("hive_nation_stats").queryExecution.optimizedPlan.stats
      val exact = s.table("hive_nation_stats").count()
      require(stats.rowCount.exists(_.toLong == exact),
        s"CBO rowCount ${stats.rowCount} != exact $exact after ANALYZE")
      val ndvKey = stats.attributeStats.find(_._1.name == "n_nationkey")
        .flatMap(_._2.distinctCount).map(_.toLong).getOrElse(-1L)
      Seq(
        ("row_count", stats.rowCount.map(_.toLong).getOrElse(-1L)),
        ("ndv_nationkey", ndvKey))
        .toDF("stat", "value").orderBy("stat")
    }),

    // information_schema scan -> spark.catalog (fixture views).
    "src_schema_scan" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      import s.implicits._
      s.catalog.listTables().select(col("name"))
        .filter(col("name").isin(graft.Tables.names: _*))
        .orderBy(col("name"))
    })
  )

  def oracle: Map[String, String] = Map(
    "src_csv_roundtrip" -> oracleAgg,
    "src_json_roundtrip" -> oracleAgg,
    "src_orc_roundtrip" -> oracleAgg,
    "src_avro_roundtrip" -> oracleAgg,
    "src_xml_roundtrip" -> oracleAgg,
    "src_outfile" -> """
      SELECT c_nationkey, count(*) AS n FROM customer
      WHERE c_acctbal > 9000 GROUP BY c_nationkey ORDER BY c_nationkey""",
    "src_numbers" -> """
      SELECT id % 7 AS bucket, count(*) AS n, CAST(sum(id) AS BIGINT) AS s
      FROM (SELECT unnest(generate_series(1, 10000)) AS id) t
      GROUP BY bucket ORDER BY bucket""",
    "src_schema_scan" -> """
      SELECT name FROM (VALUES ('region'),('nation'),('customer'),('supplier'),
        ('part'),('orders'),('lineitem'),('events'),('documents'),('embeddings')) v(name)
      ORDER BY name""",
    "src_hive_catalog_roundtrip" -> """
      SELECT r_name, count(*) AS n, min(n_name) AS mn, max(n_name) AS mx
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""",
    "src_analyze_stats" -> """
      SELECT 'ndv_nationkey' AS stat, CAST(count(DISTINCT n_nationkey) AS BIGINT) AS value
      FROM nation
      UNION ALL
      SELECT 'row_count', count(*) FROM nation
      ORDER BY stat"""
  )
}
