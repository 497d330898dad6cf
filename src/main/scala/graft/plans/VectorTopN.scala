package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{broadcast, col, expr, lit, row_number}

import graft.functions.L2Squared

/** Vector top-n pushdown (reference:
  * fe/fe-core/.../nereids/rules/rewrite/PushDownVectorTopNIntoOlapScan.java
  * — the FE rewriting `ORDER BY distance(col, const) LIMIT k` into the
  * ANN index scan; index side be/src/storage/index/ann/faiss_ann_index.h).
  *
  * Re-expressed Spark-first AND strengthened from approximate to EXACT:
  *
  *  - The "index" is a cid-partitioned re-clustered copy of the table
  *    ([[VectorIndexes.create]]): every row is assigned to its nearest
  *    of nCells deterministic centroids and written under
  *    `cid=<cell>/` partition dirs, with per-cell stats (centroid,
  *    radius, count) kept driver-side — the FE-tablet-metadata analog.
  *  - [[VectorTopNRule]] matches GlobalLimit(k) over Sort whose FIRST
  *    key is ascending [[L2Squared]](col, literal), chases the sort key
  *    through intervening Projects, and — when the scanned path has a
  *    registered index on that column — replaces the base relation with
  *    the index scan filtered to a driver-computed cell subset. The
  *    Sort/Limit stay on top, so Spark still plans its native
  *    TakeOrderedAndProject; only the scanned row set shrinks, and
  *    parquet partition pruning turns the cell filter into skipped
  *    directories.
  *
  * Exactness (triangle inequality, L2): rank cells by d(q, c); take the
  * shortest prefix holding >= k rows; ub = max over the prefix of
  * (d(q,c) + radius(c)) bounds the kth-nearest distance from above
  * (every one of those >= k rows is within its cell's d(q,c)+r). A cell
  * with d(q,c) - radius(c) > ub can hold no top-k member (each member x
  * has d(q,x) >= d(q,c) - r(c) > ub >= d_k), so scanning only cells
  * with lb <= ub is EXACT — unlike the reference's nprobe contract, no
  * recall loss. A float epsilon pads the comparison so last-ulp driver
  * arithmetic can only over-scan, never over-prune.
  *
  * 100 TB anatomy: stats are nCells rows (driver-resident, like FE
  * tablet metadata); the rewrite itself costs O(nCells) driver work;
  * the probe scan reads only the surviving partition dirs. With
  * nCells ~ 2^12 on clustered embedding corpora the prefix bound keeps
  * the scanned fraction near nprobe/nCells while staying exact.
  */
object VectorIndexes {

  /** Per-cell stats: seed centroid vector, max member distance, rows. */
  case class CellStat(cid: Int, centroid: Array[Double], radius: Double, cnt: Long)

  case class IdxDef(name: String, basePath: String, vecCol: String,
                    idxPath: String, nCells: Int, stats: Seq[CellStat])

  /** (normalized base path, vector column) -> index. */
  private val registry = new TrieMap[(String, String), IdxDef]()

  def isEmpty: Boolean = registry.isEmpty
  def forScan(path: String, vecCol: String): Option[IdxDef] =
    registry.get((path, vecCol))
  def drop(name: String): Unit =
    registry.filterInPlace { case (_, d) => d.name != name }

  /** Build + register an index over `dir/table.parquet`. Centroids are
    * the first nCells rows by idCol — the deterministic no-RNG
    * convention shared with the IVF paths in ops/VectorSearch. The
    * partitioned copy carries every base column, so the rewrite can
    * substitute the relation for ANY projection above it. */
  def create(spark: SparkSession, name: String, dir: String, table: String,
             idCol: String, vecCol: String, nCells: Int,
             idxRoot: String = "target/vecidx"): IdxDef = {
    val basePath = normalize(s"$dir/$table.parquet")
    val idxPath = s"$idxRoot/$name"
    val base = spark.read.parquet(basePath)
    // NULL sort keys order before every distance under ASC NULLS FIRST,
    // so a null-vector row would belong in ANY top-k — but it carries no
    // distance, so no cell bound can retain it soundly. Refuse to index
    // such a table rather than risk pruning a row the sort would keep.
    val nNull = base.filter(col(vecCol).isNull).count()
    require(nNull == 0,
      s"$table.$vecCol has $nNull NULL vectors — a null sort key defeats " +
        "the triangle-inequality bound; filter or impute before indexing")
    val prep = base
      .withColumn("__v", expr(s"transform($vecCol, x -> cast(x as double))"))
    val cent = broadcast(prep.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).cast("int").as("__cid0"), col("__v").as("__cv")))
    val wBest = Window.partitionBy(col(idCol)).orderBy(col("__d").asc, col("__cid").asc)
    // dense 0..nCells-1 cell ids (partition-dir names stay small even
    // when idCol values are sparse). The unpartitioned window is
    // bounded BY CONSTRUCTION: `cent` is .limit(nCells) upstream, so
    // the single partition holds at most nCells rows (an index-build
    // parameter, not data volume).
    val centIdx = cent.withColumn("__cid",
      row_number().over(Window.orderBy(col("__cid0"))) - 1)
      .select(col("__cid"), col("__cv"))
    // checkpointed: both the partitioned write and the stats pass read
    // this once instead of re-running the assignment join
    val assigned = prep.crossJoin(broadcast(centIdx))
      .withColumn("__d", expr("graft_l2sq(__v, __cv)"))
      .withColumn("__rn", row_number().over(wBest)).filter(col("__rn") === 1)
      .localCheckpoint()
    assigned
      .select(base.columns.map(col) :+ col("__cid").as("cid"): _*)
      .write.mode("overwrite").partitionBy("cid").parquet(idxPath)
    // per-cell stats: tiny (nCells rows), collected driver-side like FE
    // tablet metadata; radius in TRUE L2 (sqrt of the squared kernel)
    val statRows = assigned
      .groupBy(col("__cid"))
      .agg(org.apache.spark.sql.functions.max(expr("sqrt(__d)")).as("r"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions.first(col("__cv")).as("cv"))
      .collect()
    val stats = statRows.map { r =>
      CellStat(r.getInt(0),
        r.getSeq[Double](r.fieldIndex("cv")).toArray,
        r.getDouble(r.fieldIndex("r")), r.getLong(r.fieldIndex("n")))
    }.toSeq.sortBy(_.cid)
    val d = IdxDef(name, basePath, vecCol, idxPath, nCells, stats)
    registry.put((basePath, vecCol), d)
    d
  }

  /** EXACT pruned cell set for query vector q and limit k (see the
    * object doc for the bound proof). Returns None when k exceeds the
    * indexed row count (the sort needs every row anyway). */
  def prunedCells(d: IdxDef, q: Array[Double], k: Int): Option[Seq[Int]] = {
    if (d.stats.map(_.cnt).sum < k) return None
    def dist(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val n = math.min(c.length, q.length)
      while (i < n) { val t = c(i) - q(i); s += t * t; i += 1 }
      math.sqrt(s)
    }
    val byDist = d.stats.map(s => (s, dist(s.centroid))).sortBy(_._2)
    var need = k.toLong
    var ub = 0.0
    val it = byDist.iterator
    while (need > 0 && it.hasNext) {
      val (s, dc) = it.next()
      ub = math.max(ub, dc + s.radius)
      need -= s.cnt
    }
    val eps = 1e-9 * (1.0 + ub)
    Some(byDist.collect { case (s, dc) if dc - s.radius <= ub + eps => s.cid })
  }

  def normalize(p: String): String =
    new java.io.File(p).getAbsolutePath
}

/** The pushdown rule (injected via SparkSessionExtensions; opt-in via
  * `spark.graft.vectorTopN.enabled`, mirroring the reference's
  * session-variable gate on its ANN topn rule). */
class VectorTopNRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import VectorIndexes._

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.vectorTopN.enabled").contains("true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled || VectorIndexes.isEmpty) plan
    else plan.transformUp {
      case gl @ GlobalLimit(IntegerLiteral(k), child) =>
        rewriteUnder(child, k).map(c => gl.copy(child = c)).getOrElse(gl)
    }

  /** Descend through the row-count-preserving layers the optimizer
    * parks between the limit and the sort (LocalLimit with any m —
    * pruning with the smaller global k stays conservative — plus
    * Project/SubqueryAlias), rebuild them over the rewritten Sort. */
  private def rewriteUnder(p: LogicalPlan, k: Int): Option[LogicalPlan] = p match {
    case ll: LocalLimit => rewriteUnder(ll.child, k).map(c => ll.copy(child = c))
    case pr: Project => rewriteUnder(pr.child, k).map(c => pr.copy(child = c))
    case sa: SubqueryAlias => rewriteUnder(sa.child, k).map(c => sa.copy(child = c))
    case s @ Sort(order, true, child, _) =>
      tryRewrite(k, order, child).map(nc => s.copy(child = nc))
    case _ => None
  }

  /** Unwrap SubqueryAlias/Project layers down to the relation,
    * collecting alias definitions so the sort key can be resolved back
    * to scan columns. Any other node (Filter, Join, Aggregate, …)
    * aborts: a filter would invalidate the count-based bound (pruning
    * stats describe the UNfiltered cells). */
  @annotation.tailrec
  private def unwrap(p: LogicalPlan, env: Map[ExprId, Expression])
      : Option[(Map[ExprId, Expression], LogicalPlan)] = p match {
    case SubqueryAlias(_, c) => unwrap(c, env)
    case Project(pl, c) =>
      unwrap(c, env ++ pl.collect { case a: Alias => a.exprId -> a.child })
    case r if MaterializedViews.relationPath(r).isDefined => Some((env, r))
    case _ => None
  }

  private def resolve(e: Expression, env: Map[ExprId, Expression]): Expression = {
    var cur = e
    var i = 0
    var changed = true
    while (changed && i < 8) {
      val next = cur.transformUp {
        case a: AttributeReference if env.contains(a.exprId) => env(a.exprId)
      }
      changed = !next.fastEquals(cur)
      cur = next
      i += 1
    }
    cur
  }

  /** evaluate a foldable query-vector literal; None (rule bails, query
    * runs unrewritten) on null elements or any eval surprise — an
    * optimizer rule must never throw on odd-but-legal input. */
  private def asQueryVec(e: Expression): Option[Array[Double]] =
    if (!e.foldable) None
    else try Option(e.eval(null)).flatMap { v =>
      val ad = v.asInstanceOf[ArrayData]
      val isFloat = e.dataType match {
        case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      }
      val n = ad.numElements()
      val out = new Array[Double](n)
      var ok = true
      var i = 0
      while (ok && i < n) {
        if (ad.isNullAt(i)) ok = false
        else {
          out(i) = if (isFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
          i += 1
        }
      }
      if (ok) Some(out) else None
    } catch { case _: RuntimeException => None }

  private def matchDistKey(e: Expression)
      : Option[(AttributeReference, Array[Double])] = e match {
    case L2Squared(a: AttributeReference, q) => asQueryVec(q).map(v => (a, v))
    case L2Squared(q, a: AttributeReference) => asQueryVec(q).map(v => (a, v))
    case Sqrt(inner) => matchDistKey(inner)
    case _ => None
  }

  private def tryRewrite(k: Int, order: Seq[SortOrder],
                         child: LogicalPlan): Option[LogicalPlan] = {
    if (k <= 0 || order.isEmpty || order.head.direction != Ascending) return None
    for {
      (env, rel) <- unwrap(child, Map.empty)
      path <- MaterializedViews.relationPath(rel)
      (vecAttr, qvec) <- matchDistKey(resolve(order.head.child, env))
      // the sort column must be THE scanned relation's column
      if rel.output.exists(_.exprId == vecAttr.exprId)
      d <- forScan(path, vecAttr.name)
      cells <- prunedCells(d, qvec, k)
      repl <- buildReplacement(d, cells, rel)
    } yield child.transformUp {
      case r if r.fastEquals(rel) => repl
    }
  }

  /** Index scan filtered to the surviving cells, projected back onto
    * the original relation's attribute ids — the plan-substitution
    * contract (parents, including the Sort's key, are untouched). */
  private def buildReplacement(d: IdxDef, cells: Seq[Int],
                               rel: LogicalPlan): Option[LogicalPlan] = {
    val idx = spark.read.parquet(d.idxPath)
      .where(col("cid").isin(cells.map(Int.box): _*))
    val analyzed = idx.queryExecution.analyzed
    val byName = analyzed.output.map(a => a.name -> a).toMap
    val aliases = rel.output.map { a =>
      byName.get(a.name).map(ia =>
        Alias(ia, a.name)(exprId = a.exprId): NamedExpression)
    }
    if (aliases.exists(_.isEmpty)) None
    else Some(Project(aliases.flatten, analyzed))
  }
}
