package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

import graft.ops.SearchDsl

/** `score()` — the reference's relevance pseudo-column
  * (BuiltinScalarFunctions.java registers `score`; BE
  * function_score.cpp surfaces the inverted-index BM25 of the row
  * under the enclosing `search()` predicate, and the FE binds it to a
  * virtual slot).
  *
  * Spark-first re-expression: `score()` resolves to an unevaluable
  * [[ScoreCall]] placeholder and `search('<dsl>')` wraps its compiled
  * predicate in a [[SearchTag]] carrying the DSL text. This optimizer
  * rule then rewrites every ScoreCall into a per-row BM25 expression
  * (k1=1.2, b=0.75, Lucene idf — identical to `SearchDsl.score`):
  * per-row tf/len are codegen'd array expressions over tokenize()
  * semantics, and the corpus statistics (N, avgdl, per-term df) are
  * uncorrelated scalar subqueries over the pre-filter corpus — each a
  * tiny single-row aggregate that Spark plans once and broadcasts, so
  * the scored scan stays a single pass at any scale.
  *
  * Scoreable terms are the positive Term/Phrase/ANY/ALL/IN leaves of
  * the DSL (prefix/wildcard/regexp/range/EXACT filter but contribute
  * no score — Lucene's constant-score semantics; NOT-negated clauses
  * contribute nothing).
  */
object ScoreRewrite {

  /** `score()` before rewrite — resolved, typed, unevaluable. */
  case class ScoreCall() extends LeafExpression with Unevaluable {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "score"
  }

  /** transparent wrapper tagging a compiled search() predicate with its
    * DSL text; behaves exactly like its child and is stripped by the
    * rule, so it never survives to physical planning. */
  case class SearchTag(dsl: String, child: Expression) extends UnaryExpression {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def foldable: Boolean = false
    override def eval(input: InternalRow): Any = child.eval(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      child.genCode(ctx)
    override protected def withNewChildInternal(c: Expression): SearchTag =
      copy(child = c)
  }

  /** positive scoreable (field, lowercased term) pairs of a DSL AST. */
  def scoreableTerms(n: SearchDsl.Node): Seq[(String, String)] = {
    def words(s: String): Seq[String] =
      s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    n match {
      case SearchDsl.Term(f, v)   => words(v).map(f -> _)
      case SearchDsl.Phrase(f, v) => words(v).map(f -> _)
      case SearchDsl.AnyOf(f, vs) => vs.flatMap(words).map(f -> _)
      case SearchDsl.AllOf(f, vs) => vs.flatMap(words).map(f -> _)
      case SearchDsl.ListIn(f, vs) => vs.flatMap(words).map(f -> _)
      case SearchDsl.And(l, r) => scoreableTerms(l) ++ scoreableTerms(r)
      case SearchDsl.Or(l, r)  => scoreableTerms(l) ++ scoreableTerms(r)
      case SearchDsl.Not(_)    => Nil
      case _                   => Nil
    }
  }
}

class ScoreRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import ScoreRewrite._

  private val K1 = 1.2
  private val B = 0.75

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val hasScore =
      plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[ScoreCall])))
    val hasTag =
      plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[SearchTag])))
    if (!hasScore && !hasTag) return plan
    val p1 = if (!hasScore) plan else rewriteScores(plan)
    // tags are transparent filters once scoring is resolved — strip so
    // the inner predicate pushes down like any boolean conjunction
    p1.transformAllExpressions { case SearchTag(_, c) => c }
  }

  private def rewriteScores(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case n if n.expressions.exists(_.exists(_.isInstanceOf[ScoreCall])) =>
      val tagged = n.collectFirst {
        case f @ Filter(cond, _) if cond.exists(_.isInstanceOf[SearchTag]) => f
      }
      tagged match {
        case Some(Filter(cond, corpus)) =>
          val dsl = cond.collect { case SearchTag(d, _) => d }.mkString(" ")
          val score = buildScore(dsl, corpus)
          n.transformExpressions { case _: ScoreCall => score }
        case None => throw new IllegalStateException(
          "score() requires a search('<dsl>') predicate in the same query " +
            "block - it is the BM25 relevance of the row under that search")
      }
  }

  /** the per-row BM25 expression for every scoreable (field, term). */
  private def buildScore(dsl: String, corpus: LogicalPlan): Expression = {
    val pairs = scoreableTerms(SearchDsl.parse(dsl)).distinct
    if (pairs.isEmpty) throw new IllegalStateException(
      s"score(): the search DSL '$dsl' has no scoreable terms " +
        "(prefix/wildcard/regexp/range/EXACT clauses are constant-score)")
    val parts = pairs.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (field, fieldPairs) =>
        val attr = corpus.output.find(_.name.equalsIgnoreCase(field)).getOrElse(
          throw new IllegalStateException(
            s"score(): search field '$field' not found in " +
              corpus.output.map(_.name).mkString("[", ", ", "]")))
        val toksSql = s"filter(split(lower(`${attr.name}`), '[^a-z0-9]+')," +
          " t -> length(t) > 0)"
        val terms = fieldPairs.map(_._2).distinct
        // ALL the field's corpus stats ride ONE struct-valued scalar
        // subquery — a single stats pass over the corpus regardless of
        // term count (subquery reuse dedups the repeated references)
        val statsSql = (
          Seq(s"'n_docs', CAST(count(1) AS DOUBLE)",
              s"'avgdl', CAST(avg(size($toksSql)) AS DOUBLE)") ++
          terms.zipWithIndex.map { case (t, i) =>
            s"'df_$i', CAST(count_if(array_contains($toksSql, '${sqlEsc(t)}')) AS DOUBLE)"
          }).mkString("named_struct(", ", ", ")")
        val stats = statSubquery(corpus, statsSql)
        val nDocs = GetStructField(stats, 0, Some("n_docs"))
        val avgdl = GetStructField(stats, 1, Some("avgdl"))
        val len = Cast(Size(tokens(attr), legacySizeOfNull = false), DoubleType)
        terms.zipWithIndex.map { case (term, i) =>
          val df = GetStructField(stats, 2 + i, Some(s"df_$i"))
          val toks = tokens(attr)
          val tf = Cast(Subtract(
            Size(toks, legacySizeOfNull = false),
            Size(ArrayRemove(toks, Literal(term)), legacySizeOfNull = false)),
            DoubleType)
          // Lucene BM25: ln(1 + (N - df + .5)/(df + .5)) * tf*(k1+1)
          //              / (tf + k1*(1 - b + b*len/avgdl))
          val idf = Log(Add(Literal(1.0), Divide(
            Add(Subtract(nDocs, df), Literal(0.5)),
            Add(df, Literal(0.5)))))
          Multiply(idf, Divide(
            Multiply(tf, Literal(K1 + 1.0)),
            Add(tf, Multiply(Literal(K1),
              Add(Literal(1.0 - B), Multiply(Literal(B), Divide(len, avgdl)))))))
        }
    }
    Coalesce(Seq(parts.reduceLeft[Expression](Add(_, _)), Literal(0.0)))
  }

  /** tokenize(attr) as a resolved expression tree (inline expansion of
    * the tokenize() SQL UDF so the rule has no session dependency). */
  private def tokens(attr: Attribute): Expression = {
    val t = NamedLambdaVariable("t", StringType, nullable = true)
    ArrayFilter(
      StringSplit(Lower(attr), Literal("[^a-z0-9]+"), Literal(-1)),
      LambdaFunction(GreaterThan(Length(t), Literal(0)), Seq(t)))
  }

  /** a single-row single-column aggregate over the corpus, wrapped as
    * an uncorrelated scalar subquery (planned once, result broadcast). */
  private def statSubquery(corpus: LogicalPlan, aggSql: String): Expression = {
    val unresolved = Aggregate(Nil,
      Seq(Alias(CatalystSqlParser.parseExpression(aggSql), "v")()), corpus)
    // fully optimized: the optimizer's own OptimizeSubqueries batch has
    // already run by the time this rule injects the subquery, and
    // physical planning assumes subquery plans arrive optimized
    ScalarSubquery(spark.sessionState.executePlan(unresolved).optimizedPlan)
  }

  private def sqlEsc(v: String): String =
    v.replace("\\", "\\\\").replace("'", "\\'")
}
