package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{DeltaLite, DeltaWriter, HudiLite, IcebergLite, IcebergWriter, PaimonLite, PaimonWriter}

/** SQL surface for the in-repo lakehouse writers — the `graft_iceberg`
  * / `graft_delta` / `graft_hudi` / `graft_paimon` catalog names
  * (deliberately NOT the connector strings: everything routes through
  * the repo's own readers/writers, no jars). Reference shape: the
  * multi-catalog DDL/DML surface of fe/fe-core/.../datasource/ — here
  * re-expressed as a pre-parse statement route in [[GraftSqlParser]],
  * the same mechanism WITH RECURSIVE uses (RecursiveSql.scala).
  *
  * Grammar (own catalogs, spec-minimal):
  *   CREATE [OR REPLACE] TABLE graft_<fmt>.<name>
  *     [PRIMARY KEY (k, ...)] [PARTITIONED BY (p)] AS <select>
  *   INSERT INTO graft_<fmt>.<name> <select>
  *   DELETE FROM graft_<fmt>.<name> WHERE <cond>   (all four: position
  *     deletes / deletion vectors / -D rows / delete blocks)
  *   SELECT ... FROM graft_<fmt>.<name> [FOR VERSION AS OF n] ...
  *
  * Tables live under `spark.graft.lakehouse.dir` (default
  * target/lakehouse) as `<fmt>/<name>`; the catalog metadata a real FE
  * would hold (partition column, primary key) persists in a
  * `_graft_table.json` sidecar written at CREATE, so INSERT/SELECT
  * need only the name. Writes execute eagerly during the parse
  * pre-pass (the RecursiveSql precedent) and the statement resolves to
  * `SELECT <version> AS committed_version`; reads substitute each
  * reference with a temp view over the format's independent read path
  * (snapshot semantics: the view is re-registered per statement).
  * Paimon without PRIMARY KEY creates an append-only table.
  *
  * Honest scope: the SQL route does not infer the library readers'
  * FE-role partition `partFilter` from the statement's WHERE clause —
  * a `WHERE part = 'X'` still plans every live file (Spark then prunes
  * row groups via parquet pushdown, but file-level skipping needs the
  * library API or a manifest-aware catalog plugin on a real cluster).
  * Statement-level only: no multi-statement transactions. */
object LakehouseSql {

  private val CreateRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" +
      "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s*" +
      "(?:PRIMARY\\s+KEY\\s*\\(([^)]*)\\)\\s*)?" +
      "(?:PARTITIONED\\s+BY\\s*\\(([^)]*)\\)\\s*)?" +
      "AS\\s+(.*)$").r
  private val InsertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+(.*)$".r
  private val DeleteRe =
    "(?is)^\\s*DELETE\\s+FROM\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+WHERE\\s+(.*)$".r
  private val RefRe = "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)".r
  private val RefVerRe =
    ("(?i)graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)" +
      "\\s+FOR\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)").r

  def handles(sql: String): Boolean = RefRe.findFirstIn(sql).isDefined

  private def warehouse(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.lakehouse.dir")
      .getOrElse("target/lakehouse")

  private def tableDir(spark: SparkSession, fmt: String, name: String): String =
    new java.io.File(s"${warehouse(spark)}/$fmt/$name").getAbsolutePath

  private final case class Props(partCol: Option[String], keyCols: Seq[String])

  private def writeProps(dir: String, p: Props): Unit = {
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_table.json"),
      s"""{"partCol":${p.partCol.map(c => s""""$c"""").getOrElse("null")},""" +
        s""""keyCols":[${p.keyCols.map(c => s""""$c"""").mkString(",")}]}""")
  }

  private def readProps(dir: String): Props = {
    val f = java.nio.file.Paths.get(dir, "_graft_table.json")
    require(java.nio.file.Files.exists(f), s"unknown lake table at $dir")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(f))
    val keys = Option(node.get("keyCols")).map(a =>
      (0 until a.size).map(a.get(_).asText)).getOrElse(Seq.empty)
    Props(Option(node.get("partCol")).filterNot(_.isNull).map(_.asText), keys)
  }

  /** Zero-padded next Hudi instant from the timeline. */
  private def nextInstant(dir: String): String = {
    val max = Option(new java.io.File(dir, ".hoodie").list())
      .getOrElse(Array.empty)
      .map(_.split('.').head).filter(_.forall(_.isDigit))
      .foldLeft(0)((m, s) => math.max(m, s.toInt))
    f"${max + 1}%03d"
  }

  /** Snapshot read, optionally at a version — `FOR VERSION AS OF n`
    * takes each format's native coordinate: Iceberg snapshot id, Delta
    * version, Paimon snapshot id, Hudi instant (zero-padded). */
  private def reader(spark: SparkSession, fmt: String, dir: String,
                     p: Props, version: Option[Long] = None): DataFrame =
    fmt match {
      case "iceberg" => IcebergLite.readSnapshot(spark, dir, version)
      case "delta"   => DeltaLite.readVersion(spark, dir, version)
      case "hudi"    => HudiLite.readSnapshotMor(spark, dir, p.keyCols,
        instant = version.map(v => f"$v%03d"))
      case "paimon"  =>
        if (p.keyCols.isEmpty) PaimonLite.readAppendOnly(spark, dir, version)
        else PaimonLite.readSnapshot(spark, dir, p.keyCols, version)
    }

  private def appendTo(spark: SparkSession, fmt: String, dir: String,
                       p: Props, df: DataFrame, create: Boolean): Long = fmt match {
    case "iceberg" =>
      // PRIMARY KEY tables upsert on INSERT (equality-delete commits),
      // matching the paimon/hudi route's PK semantics; keyless tables
      // append
      if (!create && p.keyCols.nonEmpty)
        IcebergWriter.upsert(spark, dir, df, p.keyCols, p.partCol)
      else IcebergWriter.append(spark, dir, df, p.partCol)
    case "delta"   =>
      require(p.keyCols.isEmpty,
        "graft_delta tables are append/delete only — PRIMARY KEY upsert " +
          "semantics live on graft_iceberg (equality deletes), " +
          "graft_paimon (LSM) and graft_hudi (MoR)")
      DeltaWriter.append(spark, dir, df, p.partCol)
    case "hudi"    =>
      require(p.keyCols.nonEmpty && p.partCol.nonEmpty,
        "graft_hudi tables need PRIMARY KEY and PARTITIONED BY")
      val instant = if (create) "001" else nextInstant(dir)
      if (create)
        HudiLite.createTable(spark, dir, df, p.keyCols, p.partCol.get, instant)
      else
        HudiLite.upsert(spark, dir, df, p.keyCols, p.partCol.get, instant)
      instant.toLong
    case "paimon"  =>
      if (p.keyCols.isEmpty) {
        require(p.partCol.nonEmpty, "graft_paimon tables need PARTITIONED BY")
        PaimonWriter.appendOnly(spark, dir, df, p.partCol.get)
      } else {
        require(p.partCol.exists(p.keyCols.contains),
          "paimon PRIMARY KEY must include the partition column")
        PaimonWriter.append(spark, dir, df, p.partCol.get, p.keyCols)
      }
  }

  /** Rewrite (and for writes: execute) one statement. Returns the SQL
    * Spark should actually parse. */
  def rewrite(spark: SparkSession, sql: String): String = sql match {
    case CreateRe(orReplace, fmt, name, pkRaw, partRaw, select) =>
      val dir = tableDir(spark, fmt, name)
      val exists = java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_graft_table.json"))
      require(!exists || orReplace != null,
        s"table graft_$fmt.$name already exists (use CREATE OR REPLACE)")
      if (exists) org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val props = Props(
        Option(partRaw).map(_.trim).filter(_.nonEmpty),
        Option(pkRaw).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty))
      val version = appendTo(spark, fmt, dir, props, spark.sql(select), create = true)
      writeProps(dir, props)
      s"SELECT CAST($version AS BIGINT) AS committed_version"
    case InsertRe(fmt, name, select) =>
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      // align the incoming rows to the TABLE schema (by name, cast to
      // the stored types) — mixed int/long parquet across commits
      // would otherwise poison later merged reads
      val incoming = spark.sql(select)
      val target = reader(spark, fmt, dir, p).schema
      require(incoming.columns.toSet == target.fieldNames.toSet,
        s"INSERT columns ${incoming.columns.mkString(",")} must match " +
          s"the table's ${target.fieldNames.mkString(",")}")
      val aligned = incoming.select(target.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
          .as(f.name)): _*)
      val version = appendTo(spark, fmt, dir, p, aligned, create = false)
      s"SELECT CAST($version AS BIGINT) AS committed_version"
    case DeleteRe(fmt, name, cond) =>
      import org.apache.spark.sql.functions.{expr, lit}
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      // each format's native row-delete spelling: Iceberg position
      // deletes, Delta deletion vectors, Paimon -D retraction rows,
      // Hudi delete blocks
      val version = fmt match {
        case "iceberg" => IcebergWriter.deleteRows(spark, dir, expr(cond))
        case "delta" => DeltaWriter.deleteRows(spark, dir, expr(cond))
        case "paimon" =>
          require(p.keyCols.nonEmpty,
            "DELETE FROM an append-only paimon table is not supported " +
              "(append tables are immutable facts)")
          val victims = PaimonLite.readSnapshot(spark, dir, p.keyCols)
            .filter(expr(cond))
            .withColumn("_VALUE_KIND", lit(PaimonLite.KindDelete))
          PaimonWriter.append(spark, dir, victims, p.partCol.get, p.keyCols)
        case "hudi" =>
          val keys = HudiLite.readSnapshotMor(spark, dir, p.keyCols)
            .filter(expr(cond))
            .select(p.keyCols.map(org.apache.spark.sql.functions.col): _*)
          val instant = nextInstant(dir)
          HudiLite.deleteKeys(spark, dir, keys, p.keyCols, instant)
          instant.toLong
      }
      s"SELECT CAST($version AS BIGINT) AS committed_version"
    case _ =>
      // read path: substitute each reference with a snapshot temp view
      // — versioned references (FOR VERSION AS OF n) first, so the
      // plain pattern cannot eat their table token
      val versioned = RefVerRe.replaceAllIn(sql, m => {
        val (fmt, name, v) = (m.group(1), m.group(2), m.group(3).toLong)
        val dir = tableDir(spark, fmt, name)
        val view = s"graft_lake_${fmt}_${name}_v$v"
        reader(spark, fmt, dir, readProps(dir), Some(v))
          .createOrReplaceTempView(view)
        view
      })
      RefRe.replaceAllIn(versioned, m => {
        val (fmt, name) = (m.group(1), m.group(2))
        val dir = tableDir(spark, fmt, name)
        val view = s"graft_lake_${fmt}_$name"
        reader(spark, fmt, dir, readProps(dir)).createOrReplaceTempView(view)
        view
      })
  }
}
