package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session factory: one place that wires the graft engine into Spark —
  * custom function registry + optimizer rules via SparkSessionExtensions,
  * and scale-appropriate defaults (AQE on, shuffle partitions sized for
  * the local core count rather than the 200 default).
  *
  * On a real cluster the same extensions class is passed via
  * `spark.sql.extensions=graft.GraftExtensions`; nothing here is
  * local-mode-specific except the master URL.
  */
object GraftSession {

  /** Apply engine config to an arbitrary builder (used by Verify/Bench).
    * SPARK_GRAFT_CONF can append/override settings, e.g.
    * "spark.sql.shuffle.partitions=8;spark.x=y" (experiment hook). */
  def configure(b0: SparkSession.Builder): SparkSession.Builder =
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2)).collect {
        case Array(k, v) => (k.trim, v.trim)
      }.foldLeft(base(b0)) { case (bb, (k, v)) => bb.config(k, v) }

  /** best-effort: drop hive_ms dirs left by dead JVMs (each run creates
    * a pid-suffixed Derby + warehouse; without this they accumulate). */
  private def cleanStaleMetastores(): Unit =
    try {
      val root = new java.io.File("target/hive_ms")
      val self = ProcessHandle.current().pid()
      Option(root.listFiles()).getOrElse(Array.empty).foreach { f =>
        val pid = f.getName.replaceAll("^(pid_|warehouse_)", "")
        if (pid.forall(_.isDigit) && pid.nonEmpty && pid.toLong != self &&
            ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) == false) {
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
            x.delete(); ()
          }
          rm(f)
        }
      }
    } catch { case _: Throwable => () }

  private def base(b: SparkSession.Builder): SparkSession.Builder = {
    cleanStaleMetastores()
    b
    .config("spark.sql.session.timeZone", "UTC")
    // Real Hive-metastore catalog (reference: HMS external catalog,
    // fe/fe-core/.../datasource/hive/HMSExternalCatalog.java) — the jar
    // set ships spark-hive + Derby + datanucleus, so managed tables,
    // bucketed tables, and SHOW/DDL surface go through a genuine
    // HiveExternalCatalog instead of the in-memory one. Embedded Derby
    // is per-process (pid-suffixed path): concurrent JVMs (driver
    // verify + local sbt test) must not contend on one Derby lock.
    // Lazy: HMS starts only when a query first touches the catalog
    // (~6-9s once per JVM); plain parquet reads and temp views never
    // pay it.
    .config("spark.sql.catalogImplementation", "hive")
    .config("spark.hadoop.javax.jdo.option.ConnectionURL",
      s"jdbc:derby:;databaseName=target/hive_ms/pid_${ProcessHandle.current().pid()};create=true")
    .config("spark.hadoop.datanucleus.schema.autoCreateAll", "true")
    .config("spark.hadoop.hive.metastore.schema.verification", "false")
    // pid-suffixed warehouse: managed-table data dirs must not collide
    // between concurrent JVMs (each has its own Derby catalog, but the
    // default spark-warehouse/ path is shared)
    .config("spark.sql.warehouse.dir",
      s"target/hive_ms/warehouse_${ProcessHandle.current().pid()}")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    // events.parquet stores ts as TIMESTAMP(NANOS); Spark has no nanos
    // timestamp — read as long and convert in Tables.load.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.cbo.enabled", "true")
    .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Idempotent per-session function registration for sessions not built
    * through [[local]] (e.g. an existing session in tests). */
  def install(spark: SparkSession): SparkSession = {
    graft.functions.FunctionRegistry.registerAll(spark)
    spark
  }
}

/** Injected engine surface (reference FE: BuiltinScalarFunctions.java
  * registry + Nereids rewrite rules — here re-expressed as Catalyst
  * extensions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    graft.functions.FunctionRegistry.registerExtensions(e)
    // QUALIFY clause (reference: LogicalQualify + QualifyToFilter):
    // pre-parse text rewrite to a windowed-subquery filter; also binds
    // the cdc_stream('name') TVF at parse time (CdcStreamTvf.scala —
    // reference CdcStream.java; must precede ResolveFunctions' fail-fast)
    e.injectParser((s, delegate) => new graft.plans.GraftSqlParser(delegate, () => s))
    // transparent MV rewrite (reference: nereids/rules/exploration/mv/)
    e.injectOptimizerRule(s => new graft.plans.MvRewriteRule(s))
    // score() -> per-row BM25 with scalar-subquery corpus stats
    // (reference: function_score.cpp + the FE's virtual-slot binding)
    e.injectOptimizerRule(s => new graft.plans.ScoreRewriteRule(s))
    // PK-FK / unique join elimination over declared RELY constraints
    // (reference: EliminateJoinByFK.java + EliminateJoinByUnique.java)
    e.injectOptimizerRule(s => new graft.plans.FkJoinEliminationRule(s))
    // eager aggregation (reference: PushDownAggThroughJoinOneSide.java;
    // opt-in via spark.graft.eagerAgg.enabled, like Doris's session-
    // variable-gated exploration rules)
    e.injectOptimizerRule(s => new graft.plans.EagerAggRule(s))
    // double-eager aggregation: partials on BOTH join inputs, join
    // multiplicity restored via per-group counts (reference:
    // PushDownAggThroughJoin.java; opt-in via
    // spark.graft.eagerAggBoth.enabled)
    e.injectOptimizerRule(s => new graft.plans.EagerAggBothRule(s))
    // outer-join + equi-key IS NULL filter -> anti join (reference:
    // ConvertOuterJoinToAntiJoin.java; opt-in via
    // spark.graft.outerToAnti.enabled)
    e.injectOptimizerRule(s => new graft.plans.OuterToAntiRule(s))
    // correlated scalar-agg subquery -> window over a single scan
    // (reference: AggScalarSubQueryToWindowFunction.java; opt-in via
    // spark.graft.scalarAggWindow.enabled)
    e.injectOptimizerRule(s => new graft.plans.ScalarAggToWindowRule(s))
    // N exact percentiles over one column -> one array-percentile buffer
    // (reference: MergePercentileToArray.java; opt-in via
    // spark.graft.mergePercentile.enabled)
    e.injectOptimizerRule(s => new graft.plans.MergePercentileRule(s))
    // drop the UNION dedup aggregate when RELY-unique branches carry
    // pairwise-distinct literal tags (reference:
    // InferSetOperatorDistinct.java; opt-in via
    // spark.graft.inferSetOpDistinct.enabled)
    e.injectOptimizerRule(s => new graft.plans.InferSetOpDistinctRule(s))
    // (a1 JOIN r) UNION ALL (a2 JOIN r) -> (a1 UNION ALL a2) JOIN r
    // (reference: PullUpJoinFromUnionAll.java; opt-in via
    // spark.graft.pullUpUnionJoin.enabled)
    e.injectOptimizerRule(s => new graft.plans.PullUpUnionJoinRule(s))
    // GROUP BY a RELY-unique key over one scan -> stateless projection
    // (reference: EliminateGroupByKey.java + EliminateAggregate.java;
    // opt-in via spark.graft.aggByUnique.enabled)
    e.injectOptimizerRule(s => new graft.plans.AggByUniqueRule(s))
    // ORDER BY graft_l2sq(col, const) LIMIT k over a vector-indexed
    // table -> EXACT triangle-inequality-pruned cell scan (reference:
    // PushDownVectorTopNIntoOlapScan.java; opt-in via
    // spark.graft.vectorTopN.enabled)
    e.injectOptimizerRule(s => new graft.plans.VectorTopNRule(s))
    // GROUP BY coarse over (GROUP BY fine) -> one aggregate when every
    // outer call derives from the inner partials (reference:
    // MergeAggregate.java; opt-in via spark.graft.mergeAggregate.enabled)
    e.injectOptimizerRule(s => new graft.plans.MergeAggregateRule(s))
    // GROUP BY k, f(k) -> GROUP BY k (reference: SimplifyAggGroupBy.java;
    // opt-in via spark.graft.simplifyAggGroupBy.enabled)
    e.injectOptimizerRule(s => new graft.plans.SimplifyAggGroupByRule(s))
    // ORDER BY + LIMIT pushed below outer/cross joins (row-preserved
    // side) and UNION ALL branches (reference:
    // PushDownTopNThroughJoin.java + PushDownTopNThroughUnion.java;
    // opt-in via spark.graft.topnPushdown.enabled)
    e.injectOptimizerRule(s => new graft.plans.TopNPushdownRule(s))
    // sum(col + k) -> sum(col) + count(col)*k (SumLiteralRewrite.java)
    e.injectOptimizerRule(s => new graft.plans.SumLiteralRule(s))
    // HAVING min(a) < k derives row predicate a < k below the agg, down
    // to the parquet scan (reference: MaxMinFilterPushDown.java; opt-in
    // via spark.graft.maxMinFilter.enabled)
    e.injectOptimizerRule(s => new graft.plans.MaxMinFilterRule(s))
    // ORDER BY rank-output LIMIT k -> Filter(rank <= k) above the
    // window, which native InferWindowGroupLimit compiles to a
    // per-partition group limit (reference: PushDownTopNThroughWindow
    // .java; opt-in via spark.graft.topnWindow.enabled)
    e.injectOptimizerRule(s => new graft.plans.TopNWindowRule(s))
    // derive per-column pushable predicates from OR-of-AND filters so
    // untranslatable legs stop blanking PushedFilters (reference:
    // ExtractSingleTableExpressionFromDisjunction.java /
    // InferInPredicateFromOr.java; opt-in via
    // spark.graft.orExtract.enabled)
    e.injectOptimizerRule(s => new graft.plans.OrExtractRule(s))
    // transitive range inference through non-equi comparison chains
    // (reference: UnequalPredicateInfer.java; opt-in via
    // spark.graft.unequalInfer.enabled)
    e.injectOptimizerRule(s => new graft.plans.UnequalPredicateInferRule(s))
  }
}
