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
  * FILE-LEVEL PRUNING (r12): the read path extracts provably-safe
  * partition conjuncts from the statement's WHERE clause
  * ([[SqlPrune.partPredicate]] — single WHERE at top depth, no
  * OR/NOT/CASE/set-ops, column unqualified or qualified by the table)
  * and forwards them into each format's manifest-level file planning,
  * so `WHERE part = 'X'` opens one partition's files instead of every
  * footer — the same FE partition prune every reference scan plan gets
  * (nereids/rules/rewrite/PruneFileScanPartition.java). Statements the
  * extractor cannot prove stay unpruned-but-correct. [[lastScans]]
  * records (planned, total) per pruned scan for the plan asserts.
  *
  * Honest scope: statement-level only — no multi-statement
  * transactions; pruning extracts identity partition conjuncts only
  * (no expression pushdown beyond =, IN, numeric ranges). */
object LakehouseSql {

  /** One pruned read's file accounting, for plan asserts: how many
    * files the format's metadata planning admitted vs the snapshot's
    * live total. Only PRUNED reads record (unpruned reads plan once,
    * inside the reader). */
  final case class ScanRecord(fmt: String, name: String,
                              plannedFiles: Int, totalFiles: Int)
  @volatile var lastScans: List[ScanRecord] = Nil

  private val CreateRe =
    ("(?is)^\\s*CREATE\\s+(OR\\s+REPLACE\\s+)?TABLE\\s+" +
      "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s*" +
      "(?:PRIMARY\\s+KEY\\s*\\(([^)]*)\\)\\s*)?" +
      "(?:PARTITIONED\\s+BY\\s*\\(((?:[^()]|\\([^()]*\\))*)\\)\\s*)?" +
      "AS\\s+(.*)$").r
  private val InsertRe =
    "(?is)^\\s*INSERT\\s+INTO\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+(.*)$".r
  private val DeleteRe =
    "(?is)^\\s*DELETE\\s+FROM\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+WHERE\\s+(.*)$".r
  private val UpdateRe =
    ("(?is)^\\s*UPDATE\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+" +
      "SET\\s+(.+?)\\s+WHERE\\s+(.*)$").r
  private val DescribeRe =
    ("(?is)^\\s*DESC(?:RIBE)?\\s+(?:TABLE\\s+)?" +
      "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s*$").r
  private val ShowTablesRe =
    "(?is)^\\s*SHOW\\s+TABLES\\s+IN\\s+graft_(iceberg|delta|hudi|paimon)\\s*$".r
  private val ShowStreamsRe = "(?is)^\\s*SHOW\\s+STREAMS\\s*$".r
  private val DropRe =
    ("(?is)^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?" +
      "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s*$").r
  private val DropStreamRe =
    "(?is)^\\s*DROP\\s+STREAM\\s+graft_stream\\.([A-Za-z_]\\w*)\\s*$".r
  private val AlterRe =
    ("(?is)^\\s*ALTER\\s+TABLE\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+" +
      "ADD\\s+COLUMN\\s+([A-Za-z_]\\w*)\\s+([A-Za-z_]\\w*(?:\\s*\\(\\s*\\d+\\s*,\\s*\\d+\\s*\\))?)\\s*$").r
  private val MergeRe =
    ("(?is)^\\s*MERGE\\s+INTO\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)" +
      "(?:\\s+(?:AS\\s+)?([A-Za-z_]\\w*))?\\s+USING\\s+([A-Za-z_]\\w*)" +
      "(?:\\s+(?:AS\\s+)?([A-Za-z_]\\w*))?\\s+ON\\s+(.+?)\\s+" +
      "WHEN\\s+MATCHED\\s+THEN\\s+(DELETE|UPDATE\\s+SET\\s+.+?)\\s*" +
      "(WHEN\\s+NOT\\s+MATCHED\\s+THEN\\s+INSERT\\s+\\*)?\\s*$").r
  private val RefRe = "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)".r
  private val CreateStreamRe =
    ("(?is)^\\s*CREATE\\s+STREAM\\s+graft_stream\\.([A-Za-z_]\\w*)\\s+" +
      "ON\\s+TABLE\\s+graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s*$").r
  private val StreamRefRe = "graft_stream\\.([A-Za-z_]\\w*)".r
  private val RefVerRe =
    ("(?i)graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)" +
      "\\s+FOR\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)").r
  private val RefTsRe =
    ("(?i)graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)" +
      "\\s+FOR\\s+TIMESTAMP\\s+AS\\s+OF\\s+(\\d+)").r
  private val InsertOverwriteRe =
    ("(?is)^\\s*INSERT\\s+OVERWRITE\\s+" +
      "graft_(iceberg|delta|hudi|paimon)\\.([A-Za-z_]\\w*)\\s+(.*)$").r

  // literal-masked: a string literal containing "graft_iceberg.x" is
  // text, not a table reference
  def handles(sql: String): Boolean = {
    val masked = SqlPrune.maskLiterals(sql)
    RefRe.findFirstIn(masked).isDefined ||
      StreamRefRe.findFirstIn(masked).isDefined ||
      ShowTablesRe.findFirstIn(masked).isDefined ||
      ShowStreamsRe.findFirstIn(masked).isDefined
  }

  // ------------------------------------------------------- table streams
  // `CREATE STREAM graft_stream.s ON TABLE graft_<fmt>.t` +
  // `SELECT ... FROM graft_stream.s` — the reference's table-stream
  // surface (catalog/stream/OlapTableStream.java, suites
  // table_stream_p0/): a named cursor over the table's change feed.
  // The cursor starts at the CURRENT commit coordinate (changes since
  // creation); each SELECT consumes (cursor, current] through
  // [[graft.streaming.CdfFeed.changes]] and advances the cursor
  // (atomic swap). An empty window returns an empty frame with the
  // feed schema. Statement-level consumption: the cursor advances when
  // the statement is rewritten, the same eager discipline as the
  // route's writes.

  private def streamFile(spark: SparkSession, name: String): java.nio.file.Path =
    java.nio.file.Paths.get(s"${warehouse(spark)}/_streams/$name.json")

  private def readStreamState(spark: SparkSession, name: String)
      : (String, String, Long) = {
    val f = streamFile(spark, name)
    require(java.nio.file.Files.exists(f), s"unknown stream graft_stream.$name")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(f))
    (node.get("fmt").asText, node.get("table").asText,
      node.get("cursor").asLong)
  }

  private def writeStreamState(spark: SparkSession, name: String,
                               fmt: String, table: String, cursor: Long): Unit = {
    val f = streamFile(spark, name)
    java.nio.file.Files.createDirectories(f.getParent)
    IcebergWriter.atomicWriteString(f,
      s"""{"fmt":"$fmt","table":"$table","cursor":$cursor}""")
  }

  /** Replace every `re` match found on the LITERAL-MASKED text (same
    * offsets as the original) with `f(match)`, splicing into the
    * original — references inside quoted strings stay untouched. */
  private def replaceRefsOutsideLiterals(sql: String,
                                         re: scala.util.matching.Regex)
                                        (f: scala.util.matching.Regex.Match => String)
      : String = {
    val masked = SqlPrune.maskLiterals(sql)
    val sb = new StringBuilder
    var last = 0
    re.findAllMatchIn(masked).foreach { m =>
      sb.append(sql.substring(last, m.start)).append(f(m))
      last = m.end
    }
    sb.append(sql.substring(last)).toString
  }

  private def warehouse(spark: SparkSession): String =
    spark.conf.getOption("spark.graft.lakehouse.dir")
      .getOrElse("target/lakehouse")

  private def tableDir(spark: SparkSession, fmt: String, name: String): String =
    new java.io.File(s"${warehouse(spark)}/$fmt/$name").getAbsolutePath

  private final case class Props(partCol: Option[String], keyCols: Seq[String],
                                 partTransform: String = "identity",
                                 partColType: String = "")

  /** Parse one PARTITIONED BY entry: a bare column (identity) or an
    * Iceberg transform call — bucket(N, col), truncate(W, col),
    * days/months/years(col). */
  private def parsePartSpec(raw: String): (String, String) = {
    val BucketRe = "(?i)^bucket\\s*\\(\\s*(\\d+)\\s*,\\s*([A-Za-z_]\\w*)\\s*\\)$".r
    val TruncRe = "(?i)^truncate\\s*\\(\\s*(\\d+)\\s*,\\s*([A-Za-z_]\\w*)\\s*\\)$".r
    val DateRe = "(?i)^(years?|months?|days?)\\s*\\(\\s*([A-Za-z_]\\w*)\\s*\\)$".r
    raw.trim match {
      case BucketRe(n, c) => (c, s"bucket[$n]")
      case TruncRe(w, c) => (c, s"truncate[$w]")
      case DateRe(t, c) =>
        val tr = t.toLowerCase.stripSuffix("s")
        (c, tr)
      case c => (c, "identity")
    }
  }

  private def writeProps(dir: String, p: Props): Unit = {
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_graft_table.json"),
      s"""{"partCol":${p.partCol.map(c => s""""$c"""").getOrElse("null")},""" +
        s""""partTransform":"${p.partTransform}",""" +
        s""""partColType":"${p.partColType}",""" +
        s""""keyCols":[${p.keyCols.map(c => s""""$c"""").mkString(",")}]}""")
  }

  private def readProps(dir: String): Props = {
    val f = java.nio.file.Paths.get(dir, "_graft_table.json")
    require(java.nio.file.Files.exists(f), s"unknown lake table at $dir")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(f))
    val keys = Option(node.get("keyCols")).map(a =>
      (0 until a.size).map(a.get(_).asText)).getOrElse(Seq.empty)
    Props(Option(node.get("partCol")).filterNot(_.isNull).map(_.asText), keys,
      Option(node.get("partTransform")).map(_.asText).getOrElse("identity"),
      Option(node.get("partColType")).map(_.asText).getOrElse(""))
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
    * version, Paimon snapshot id, Hudi instant (zero-padded). A
    * `partPred` extracted from the statement's WHERE reaches each
    * format's FILE-LEVEL planning (manifest partition tuples / Delta
    * partitionValues / Hudi partition dirs / Paimon manifest entries),
    * and the (planned, total) counts land in [[lastScans]]. */
  /** Apply the table's partition TRANSFORM to an equality literal —
    * what prunes a bucket/truncate spec: the transform of the queried
    * value is the stored partition value. None = not transformable
    * (wrong type / unsupported transform) → no prune. */
  private def transformLiteral(tr: String, colType: String, v: String)
      : Option[String] = {
    val BucketRe = "^bucket\\[(\\d+)\\]$".r
    val TruncRe = "^truncate\\[(\\d+)\\]$".r
    tr match {
      case BucketRe(n) => colType match {
        case "bigint" | "int" => scala.util.Try(v.toLong).toOption
          .map(x => IcebergLite.bucketLong(x, n.toInt).toString)
        case "string" => Some(graft.functions.IcebergBucket.ofString(
          org.apache.spark.unsafe.types.UTF8String.fromString(v), n.toInt).toString)
        case _ => None
      }
      case TruncRe(w) => colType match {
        case "bigint" | "int" => scala.util.Try(v.toLong).toOption
          .map(x => (x - java.lang.Math.floorMod(x, w.toLong)).toString)
        case "string" => Some(v.take(w.toInt))
        case _ => None
      }
      case _ => None
    }
  }

  private def reader(spark: SparkSession, fmt: String, dir: String,
                     p: Props, version: Option[Long] = None,
                     partPred: Option[String => Boolean] = None,
                     name: String = "",
                     eqVals: Option[Seq[String]] = None): DataFrame = {
    val pc = p.partCol
    val pred = partPred.filter(_ => pc.isDefined && p.partTransform == "identity")
    // the (planned, total) audit doubles the metadata walk — fine for
    // the plan-assert gates, skippable on a huge production table
    val audit = spark.conf
      .getOption("spark.graft.lakehouse.scanAudit").forall(_ == "true")
    def record(planned: => Int, total: => Int): Unit =
      if (audit) lastScans ::= ScanRecord(fmt, name, planned, total)
    val df = fmt match {
      case "iceberg" if p.partTransform != "identity" =>
        // transformed spec: an equality/IN conjunct prunes by the
        // TRANSFORM of each queried value (bucket hash / truncate
        // floor) against the stored partition values
        val tPrune = eqVals.filter(_ => pc.isDefined).flatMap { vals =>
          val targets = vals.flatMap(v =>
            transformLiteral(p.partTransform, p.partColType, v)).toSet
          if (vals.nonEmpty && targets.size == vals.size)
            Some((pc.get, p.partTransform, (pv: String) => targets.contains(pv)))
          else None
        }
        tPrune.foreach { tp =>
          record(
            IcebergLite.planFiles(dir, version, transformPrune = Some(tp))
              .count(_.content == 0),
            IcebergLite.planFiles(dir, version).count(_.content == 0))
        }
        IcebergLite.readSnapshot(spark, dir, version, transformPrune = tPrune)
      case "iceberg" =>
        pred.foreach { f =>
          record(
            IcebergLite.planFiles(dir, version,
              partPruneBy = Some((pc.get, f))).count(_.content == 0),
            IcebergLite.planFiles(dir, version).count(_.content == 0))
        }
        IcebergLite.readSnapshot(spark, dir, version,
          partPruneBy = pred.map(f => (pc.get, f)))
      case "delta" =>
        val mapFilter = pred.map(f =>
          (pv: Map[String, String]) => pv.get(pc.get).forall(f))
        mapFilter.foreach { mf =>
          record(
            DeltaLite.planFilesWithCheckpoint(spark, dir, version, Some(mf)).size,
            DeltaLite.planFilesWithCheckpoint(spark, dir, version).size)
        }
        DeltaLite.readVersion(spark, dir, version, mapFilter)
      case "hudi" =>
        val instant = version.map(v => f"$v%03d")
        pred.foreach { f =>
          record(HudiLite.planFilesMor(dir, instant, Some(f)).size,
            HudiLite.planFilesMor(dir, instant).size)
        }
        HudiLite.readSnapshotMor(spark, dir, p.keyCols, instant, pred)
      case "paimon" =>
        pred.foreach { f =>
          record(PaimonLite.planFiles(dir, version, Some(f)).size,
            PaimonLite.planFiles(dir, version).size)
        }
        if (p.keyCols.isEmpty) PaimonLite.readAppendOnly(spark, dir, version, pred)
        else PaimonLite.readSnapshot(spark, dir, p.keyCols, version, pred)
    }
    df
  }

  private def appendTo(spark: SparkSession, fmt: String, dir: String,
                       p: Props, df: DataFrame, create: Boolean): Long = fmt match {
    case "iceberg" =>
      // PRIMARY KEY tables upsert on INSERT (equality-delete commits),
      // matching the paimon/hudi route's PK semantics; keyless tables
      // append. A declared transform (bucket/truncate/date) stamps the
      // partition spec on every append.
      if (!create && p.keyCols.nonEmpty) {
        require(p.partTransform == "identity",
          "PK upsert on a transformed partition spec is out of scope")
        IcebergWriter.upsert(spark, dir, df, p.keyCols, p.partCol)
      } else IcebergWriter.append(spark, dir, df, p.partCol,
        partTransform = p.partTransform)
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

  /** Split on commas at paren depth 0 — SET lists whose expressions
    * contain function calls keep their internal commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var last = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += s.substring(last, i); last = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(last)
    out.result()
  }

  /** `col = expr` assignments (UPDATE/MERGE SET lists). */
  private def parseAssignments(raw: String, cols: Seq[String])
      : Seq[(String, String)] =
    splitTop(raw).map { a =>
      val i = a.indexOf('=')
      require(i > 0, s"bad assignment '$a'")
      val c = a.substring(0, i).trim
      require(cols.contains(c), s"SET of unknown column '$c'")
      (c, a.substring(i + 1).trim)
    }

  /** PK upsert commit for the three formats that have one. */
  private def applyUpsert(spark: SparkSession, fmt: String, dir: String,
                          p: Props, rows: DataFrame): Long = fmt match {
    case "iceberg" =>
      IcebergWriter.upsert(spark, dir, rows, p.keyCols, p.partCol)
    case "hudi" =>
      val instant = nextInstant(dir)
      HudiLite.upsert(spark, dir, rows, p.keyCols, p.partCol.get, instant)
      instant.toLong
    case "paimon" =>
      PaimonWriter.append(spark, dir, rows, p.partCol.get, p.keyCols)
    case other => sys.error(s"no PK upsert for $other")
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
      val parsedPart = Option(partRaw).map(_.trim).filter(_.nonEmpty)
        .map(parsePartSpec)
      parsedPart.foreach { case (_, tr) =>
        require(tr == "identity" || fmt == "iceberg",
          s"partition transforms are an Iceberg spec feature — graft_$fmt " +
            "takes an identity column")
      }
      val created = spark.sql(select)
      val props = Props(
        parsedPart.map(_._1),
        Option(pkRaw).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty),
        parsedPart.map(_._2).getOrElse("identity"),
        parsedPart.map(pp =>
          created.schema(pp._1).dataType.simpleString).getOrElse(""))
      val version = appendTo(spark, fmt, dir, props, created, create = true)
      writeProps(dir, props)
      s"SELECT CAST($version AS BIGINT) AS committed_version"
    case InsertOverwriteRe(fmt, name, select) =>
      // atomic full replace: Delta commits removes+adds in ONE commit,
      // Iceberg a REPLACE snapshot — a reader sees old or new, never a
      // mix (unlike a delete-then-append pair)
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      val incoming = spark.sql(select)
      val target = reader(spark, fmt, dir, p).schema
      require(incoming.columns.toSet == target.fieldNames.toSet,
        s"INSERT OVERWRITE columns ${incoming.columns.mkString(",")} must " +
          s"match the table's ${target.fieldNames.mkString(",")}")
      val aligned = incoming.select(target.fields.toSeq.map(f =>
        org.apache.spark.sql.functions.col(f.name).cast(f.dataType)
          .as(f.name)): _*)
      val version = fmt match {
        case "delta" => DeltaWriter.overwrite(spark, dir, aligned, p.partCol)
        case "iceberg" => IcebergWriter.overwrite(spark, dir, aligned, p.partCol)
        case other => sys.error(
          s"INSERT OVERWRITE is not supported on graft_$other — the LSM/" +
            "MoR disciplines replace per key (use PK INSERT), not per table")
      }
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
    case DescribeRe(fmt, name) =>
      // DESCRIBE: (col_name, data_type, comment) — comments mark the
      // partition column and PRIMARY KEY membership
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      val schema = reader(spark, fmt, dir, p).schema
      val rows = schema.fields.toSeq.map { f =>
        val notes = Seq(
          if (p.partCol.contains(f.name)) Some("partition") else None,
          if (p.keyCols.contains(f.name)) Some("primary key") else None
        ).flatten.mkString(", ")
        org.apache.spark.sql.Row(f.name, f.dataType.simpleString, notes)
      }
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val view = s"graft_describe_${fmt}_$name"
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(rows: _*)),
        StructType(Seq(StructField("col_name", StringType),
          StructField("data_type", StringType),
          StructField("comment", StringType))))
        .createOrReplaceTempView(view)
      s"SELECT * FROM $view"

    case ShowTablesRe(fmt) =>
      val root = new java.io.File(s"${warehouse(spark)}/$fmt")
      val names = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(d => new java.io.File(d, "_graft_table.json").exists())
        .map(_.getName).sorted
      val view = s"graft_show_tables_$fmt"
      import spark.implicits._
      names.toSeq.toDF("table_name").createOrReplaceTempView(view)
      s"SELECT * FROM $view ORDER BY table_name"

    case ShowStreamsRe() =>
      val root = new java.io.File(s"${warehouse(spark)}/_streams")
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val rows = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".json")).sortBy(_.getName)
        .map { f =>
          val node = m.readTree(java.nio.file.Files.readString(f.toPath))
          (f.getName.stripSuffix(".json"),
            s"graft_${node.get("fmt").asText}.${node.get("table").asText}",
            node.get("cursor").asLong)
        }
      import spark.implicits._
      rows.toSeq.toDF("stream_name", "on_table", "cursor")
        .createOrReplaceTempView("graft_show_streams")
      "SELECT * FROM graft_show_streams ORDER BY stream_name"

    case DropRe(ifExists, fmt, name) =>
      // DROP TABLE: the whole table dir (data + metadata + sidecar)
      // goes; streams created on it fail loudly at their next read
      val dir = tableDir(spark, fmt, name)
      val exists = java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_graft_table.json"))
      require(exists || ifExists != null,
        s"table graft_$fmt.$name does not exist (use DROP TABLE IF EXISTS)")
      if (exists)
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir)): Unit
      s"SELECT ${exists} AS dropped"

    case DropStreamRe(streamName) =>
      val f = streamFile(spark, streamName)
      require(java.nio.file.Files.exists(f),
        s"unknown stream graft_stream.$streamName")
      java.nio.file.Files.delete(f)
      s"SELECT '$streamName' AS dropped_stream"

    case CreateStreamRe(streamName, fmt, tblName) =>
      val dir = tableDir(spark, fmt, tblName)
      readProps(dir): Unit // table must exist
      require(!java.nio.file.Files.exists(streamFile(spark, streamName)),
        s"stream graft_stream.$streamName already exists")
      // the cursor starts NOW: the stream ships changes made after its
      // creation (the snapshot-stream contract)
      writeStreamState(spark, streamName, fmt, tblName,
        graft.streaming.CdfFeed.coordinate(spark, fmt, dir))
      s"SELECT '$streamName' AS created_stream"

    case AlterRe(fmt, name, colName, sqlType) =>
      // ADD COLUMN in each format's native evolution spelling: Delta
      // metaData commit, Iceberg schemas array, Paimon schema-N file,
      // Hudi declared-schema swap — no data movement anywhere;
      // pre-evolution files read the column as NULL
      val dir = tableDir(spark, fmt, name)
      readProps(dir): Unit // existence check
      fmt match {
        case "iceberg" => IcebergWriter.addColumn(spark, dir, colName, sqlType): Unit
        case "delta" => DeltaWriter.addColumn(spark, dir, colName, sqlType): Unit
        case "paimon" => PaimonWriter.addColumn(spark, dir, colName, sqlType): Unit
        case "hudi" => HudiLite.addColumn(spark, dir, colName, sqlType)
      }
      s"SELECT '$colName' AS added_column"

    case UpdateRe(fmt, name, setsRaw, cond) =>
      // UPDATE ... SET ... WHERE: matched rows re-land updated, spelled
      // in each format's native row-change idiom — PK formats as ONE
      // upsert commit (equality deletes / MoR log / LSM sequence); the
      // others as a row-delete commit (position deletes / DVs) followed
      // by an append of the updated rows computed from the PRE-delete
      // snapshot (the reader's file list is captured eagerly, so the
      // already-built plan is immune to the delete commit).
      import org.apache.spark.sql.functions.{col, expr}
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      val cur = reader(spark, fmt, dir, p)
      val setMap = parseAssignments(setsRaw, cur.columns.toSeq).toMap
      require(!p.keyCols.exists(setMap.contains),
        "UPDATE must not assign PRIMARY KEY columns (delete + insert instead)")
      val updated = cur.filter(expr(cond)).select(cur.columns.toSeq.map(c =>
        setMap.get(c).map(e => expr(e).as(c)).getOrElse(col(c))): _*)
      require(updated.limit(1).count() == 1, "UPDATE matched no rows")
      val version = fmt match {
        case "iceberg" if p.keyCols.nonEmpty =>
          applyUpsert(spark, fmt, dir, p, updated)
        case "iceberg" =>
          IcebergWriter.deleteRows(spark, dir, expr(cond))
          IcebergWriter.append(spark, dir, updated, p.partCol)
        case "delta" =>
          DeltaWriter.deleteRows(spark, dir, expr(cond))
          DeltaWriter.append(spark, dir, updated, p.partCol)
        case "hudi" | "paimon" =>
          applyUpsert(spark, fmt, dir, p, updated)
      }
      s"SELECT CAST($version AS BIGINT) AS committed_version"

    case MergeRe(fmt, name, tAliasRaw, srcView, sAliasRaw, cond,
                 matchedRaw, notMatchedRaw) =>
      // MERGE INTO t USING s ON cond WHEN MATCHED THEN UPDATE SET ... |
      // DELETE [WHEN NOT MATCHED THEN INSERT *] — the reference's
      // dedicated merge sink (iceberg_merge_sink_operator.h:44),
      // re-expressed over the existing writers: matched updates are PK
      // upserts (or delete+re-add on positional formats), matched
      // deletes go through each format's row-delete spelling, and
      // not-matched inserts are an anti-join of the source.
      import org.apache.spark.sql.functions.{col, lit}
      val dir = tableDir(spark, fmt, name)
      val p = readProps(dir)
      val tAlias = Option(tAliasRaw).getOrElse(name)
      val sAlias = Option(sAliasRaw).getOrElse(srcView)
      if (sAlias != srcView)
        spark.table(srcView).createOrReplaceTempView(sAlias)
      val target = reader(spark, fmt, dir, p)
      target.createOrReplaceTempView(tAlias)
      val tCols = target.columns.toSeq
      val isDelete = matchedRaw.trim.equalsIgnoreCase("DELETE")
      val setMap: Map[String, String] =
        if (isDelete) Map.empty
        else parseAssignments(
          matchedRaw.trim.replaceFirst("(?is)^UPDATE\\s+SET\\s+", ""),
          tCols).toMap
      require(!p.keyCols.exists(setMap.contains),
        "MERGE must not assign PRIMARY KEY columns")
      // plans below capture the PRE-merge file list; later re-binding of
      // tAlias (the delete matcher) cannot reach them
      val matchedDf = spark.sql(
        s"SELECT ${tCols.map(c => setMap.get(c).map(e => s"($e) AS $c")
          .getOrElse(s"$tAlias.$c AS $c")).mkString(", ")} " +
          s"FROM $tAlias JOIN $sAlias ON $cond")
      val insertDf: Option[DataFrame] = Option(notMatchedRaw).map { _ =>
        spark.sql(s"SELECT ${tCols.map(c => s"$sAlias.$c AS $c").mkString(", ")} " +
          s"FROM $sAlias WHERE NOT EXISTS (SELECT 1 FROM $tAlias WHERE $cond)")
      }
      if (p.keyCols.nonEmpty && !isDelete) {
        // the standard MERGE cardinality rule: one source row per key
        val dup = matchedDf.groupBy(p.keyCols.map(col): _*)
          .count().filter(col("count") > lit(1)).limit(1).count()
        require(dup == 0L,
          "MERGE cardinality violation: a target key matched more than one source row")
      }
      val hasMatched = matchedDf.limit(1).count() == 1
      val hasInserts = insertDf.exists(_.limit(1).count() == 1)
      require(hasMatched || hasInserts, "MERGE affected no rows")
      // join-matched scan rows — for the positional delete spelling the
      // matcher re-binds tAlias to the SCAN (its system columns survive
      // the tAlias.* projection)
      def matcher(scan: DataFrame): DataFrame = {
        scan.createOrReplaceTempView(tAlias)
        spark.sql(s"SELECT $tAlias.* FROM $tAlias JOIN $sAlias ON $cond")
      }
      def appendRows(rows: DataFrame): Long = fmt match {
        case "iceberg" => IcebergWriter.append(spark, dir, rows, p.partCol)
        case "delta" => DeltaWriter.append(spark, dir, rows, p.partCol)
        case _ => applyUpsert(spark, fmt, dir, p, rows)
      }
      // positional formats: delete the matched rows (skipped when none
      // matched), then append updated + inserted rows in one commit
      def positionalUpdate(del: (DataFrame => DataFrame) => Long): Long = {
        if (hasMatched) del(matcher): Unit
        appendRows(
          if (hasMatched && hasInserts) matchedDf.unionByName(insertDf.get)
          else if (hasMatched) matchedDf else insertDf.get)
      }
      val version: Long = (fmt, isDelete) match {
        case ("delta", false) =>
          positionalUpdate(DeltaWriter.deleteRowsWhere(spark, dir, _))
        case ("iceberg", false) if p.keyCols.isEmpty =>
          positionalUpdate(IcebergWriter.deleteRowsWhere(spark, dir, _))
        case (_, true) =>
          // matched DELETE in each format's native spelling (skipped
          // when nothing matched), inserts after
          val delV: Long =
            if (!hasMatched) -1L
            else fmt match {
              case "iceberg" => IcebergWriter.deleteRowsWhere(spark, dir, matcher)
              case "delta" => DeltaWriter.deleteRowsWhere(spark, dir, matcher)
              case "hudi" =>
                val instant = nextInstant(dir)
                HudiLite.deleteKeys(spark, dir,
                  matchedDf.select(p.keyCols.map(col): _*).distinct(),
                  p.keyCols, instant)
                instant.toLong
              case "paimon" =>
                PaimonWriter.append(spark, dir,
                  matchedDf.withColumn("_VALUE_KIND", lit(PaimonLite.KindDelete)),
                  p.partCol.get, p.keyCols)
            }
          if (hasInserts) appendRows(insertDf.get) else delV
        case (_, false) =>
          // PK upsert: matched updates + inserts in ONE commit
          applyUpsert(spark, fmt, dir, p,
            if (hasMatched && hasInserts) matchedDf.unionByName(insertDf.get)
            else if (hasMatched) matchedDf else insertDf.get)
      }
      s"SELECT CAST($version AS BIGINT) AS committed_version"

    case _ =>
      // read path: substitute each reference with a snapshot temp view
      // — versioned references (FOR VERSION AS OF n) first, so the
      // plain pattern cannot eat their table token. Partition conjuncts
      // provably tied to the scanned table prune its FILE planning
      // (extracted against the ORIGINAL statement; references inside
      // string literals are never rewritten).
      lastScans = Nil
      def prunePred(fmt: String, name: String, p: Props)
          : Option[String => Boolean] =
        p.partCol.flatMap(pc =>
          SqlPrune.partPredicate(sql, s"graft_$fmt.$name", pc))
      def pruneEqVals(fmt: String, name: String, p: Props)
          : Option[Seq[String]] =
        p.partCol.flatMap(pc =>
          SqlPrune.partEqualityValues(sql, s"graft_$fmt.$name", pc))
      // stream references first: each consumes (cursor, current] of its
      // table's change feed and advances the cursor — the second read
      // of an unchanged table is EMPTY (the table-stream contract)
      val streamed = replaceRefsOutsideLiterals(sql, StreamRefRe) { m =>
        val streamName = m.group(1)
        val (fmt, tblName, cursor) = readStreamState(spark, streamName)
        val dir = tableDir(spark, fmt, tblName)
        val p = readProps(dir)
        val current = graft.streaming.CdfFeed.coordinate(spark, fmt, dir)
        val view = s"graft_stream_v_$streamName"
        val window =
          if (current <= cursor) {
            // empty window, feed-shaped
            val dataSchema = reader(spark, fmt, dir, p).schema
            spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
              org.apache.spark.sql.types.StructType(dataSchema.fields :+
                org.apache.spark.sql.types.StructField("_CHANGE_TYPE",
                  org.apache.spark.sql.types.StringType, nullable = false)))
          } else
            graft.streaming.CdfFeed.changes(spark, fmt, dir, Some(cursor), current)
        window.createOrReplaceTempView(view)
        writeStreamState(spark, streamName, fmt, tblName, math.max(cursor, current))
        view
      }
      // timestamp travel before version travel (both before plain refs,
      // so neither eats the other's table token)
      val timestamped = replaceRefsOutsideLiterals(streamed, RefTsRe) { m =>
        val (fmt, name, ts) = (m.group(1), m.group(2), m.group(3).toLong)
        val dir = tableDir(spark, fmt, name)
        val p = readProps(dir)
        val view = s"graft_lake_${fmt}_${name}_ts$ts"
        val df = fmt match {
          case "iceberg" => IcebergLite.readSnapshotAsOf(spark, dir, ts)
          case "delta" => DeltaLite.readTimestampAsOf(spark, dir, ts)
          case "paimon" =>
            val id = PaimonLite.snapshotIdAsOf(dir, ts)
            if (p.keyCols.isEmpty) PaimonLite.readAppendOnly(spark, dir, Some(id))
            else PaimonLite.readSnapshot(spark, dir, p.keyCols, Some(id))
          case "hudi" => sys.error(
            "FOR TIMESTAMP AS OF is not supported on graft_hudi — its " +
              "timeline instants are ordinals, not timestamps (use FOR " +
              "VERSION AS OF)")
        }
        df.createOrReplaceTempView(view)
        view
      }
      val versioned = replaceRefsOutsideLiterals(timestamped, RefVerRe) { m =>
        val (fmt, name, v) = (m.group(1), m.group(2), m.group(3).toLong)
        val dir = tableDir(spark, fmt, name)
        val p = readProps(dir)
        val view = s"graft_lake_${fmt}_${name}_v$v"
        reader(spark, fmt, dir, p, Some(v), prunePred(fmt, name, p), name,
          pruneEqVals(fmt, name, p))
          .createOrReplaceTempView(view)
        view
      }
      replaceRefsOutsideLiterals(versioned, RefRe) { m =>
        val (fmt, name) = (m.group(1), m.group(2))
        val dir = tableDir(spark, fmt, name)
        val p = readProps(dir)
        val view = s"graft_lake_${fmt}_$name"
        reader(spark, fmt, dir, p, None, prunePred(fmt, name, p), name,
          pruneEqVals(fmt, name, p))
          .createOrReplaceTempView(view)
        view
      }
  }
}
