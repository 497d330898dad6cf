package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.functions.expr

/** The reference's `search()` DSL (fe/fe-catalog/.../SearchDslParser.java,
  * be/src/exprs/function/function_search.h:46) re-expressed as an
  * analysis-time rewrite: the DSL literal parses to a clause AST which
  * compiles into a predicate over the referenced columns, built from
  * the existing match_* / tokenize primitives — the same shape as the
  * FE's RewriteSearchToSlots (the BE's inverted-index bitmap walk is
  * replaced by Catalyst predicates; the parquet scan IS the index at
  * our scale, and the compiled predicate pushes/codegens like any
  * boolean expression).
  *
  * Supported syntax (SearchDslParser.java:42-56):
  *   field:term          tokenized term match
  *   field:"a phrase"    contiguous phrase match
  *   field:pre*          prefix match (trailing star)
  *   field:*wild*card?   wildcard over tokens (* and ?)
  *   field:/regex/       regexp over tokens
  *   field:[a TO b]      range, inclusive; {..} exclusive; * = open
  *   field:IN(v1 v2)     any value is a token
  *   field:ANY(v1 v2)    tokenized any-match (= match_any)
  *   field:ALL(v1 v2)    tokenized all-match (= match_all)
  *   field:EXACT(value)  exact untokenized equality
  *   a AND b, a OR b, NOT a, parentheses, field:(x OR y) grouping;
  *   adjacent clauses join with the default operator (OR, like the
  *   reference's normalizeDefaultOperator).
  *
  * Null contract: every leaf is coalesce(pred, false), so NULL fields
  * never match a positive clause and DO match under NOT — Lucene's
  * MUST_NOT-over-absent-docs behavior.
  */
object SearchDsl {

  sealed trait Node
  case class Term(field: String, value: String) extends Node
  case class Phrase(field: String, value: String) extends Node
  case class Prefix(field: String, value: String) extends Node
  case class Wildcard(field: String, pattern: String) extends Node
  case class Regexp(field: String, pattern: String) extends Node
  case class Range(field: String, lo: Option[String], hi: Option[String],
                   loInc: Boolean, hiInc: Boolean) extends Node
  case class ListIn(field: String, values: Seq[String]) extends Node
  case class AnyOf(field: String, values: Seq[String]) extends Node
  case class AllOf(field: String, values: Seq[String]) extends Node
  case class Exact(field: String, value: String) extends Node
  case class And(l: Node, r: Node) extends Node
  case class Or(l: Node, r: Node) extends Node
  case class Not(n: Node) extends Node

  /** Recursive-descent parser over the raw DSL string. Keywords (AND,
    * OR, NOT, TO, IN, ANY, ALL, EXACT) are uppercase, matching the
    * reference's ANTLR grammar. */
  def parse(dsl: String): Node = new Parser(dsl).parseAll()

  private final class Parser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (i < s.length) s.charAt(i) else '\u0000'
    private def eof: Boolean = { ws(); i >= s.length }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"search DSL syntax error at $i: $msg in '$s'")

    private def keywordAt(kw: String): Boolean = {
      ws()
      s.regionMatches(i, kw, 0, kw.length) && {
        val after = i + kw.length
        after >= s.length || !Character.isLetterOrDigit(s.charAt(after))
      }
    }
    private def eat(kw: String): Unit = { ws(); i += kw.length }

    def parseAll(): Node = {
      val n = parseOr(None)
      ws()
      if (i < s.length) fail(s"unexpected trailing input '${s.substring(i)}'")
      n
    }

    private def parseOr(field: Option[String]): Node = {
      var n = parseAnd(field)
      while (keywordAt("OR")) { eat("OR"); n = Or(n, parseAnd(field)) }
      n
    }

    // grammar: andClause : notClause (AND? notClause)* — adjacency (no
    // explicit operator) binds at THIS level and joins with the default
    // operator, which the reference normalizes to OR in standard mode
    private def parseAnd(field: Option[String]): Node = {
      var n = parseNot(field)
      var continue = true
      while (continue) {
        ws()
        if (keywordAt("AND")) { eat("AND"); n = And(n, parseNot(field)) }
        else if (i < s.length && peek != ')' && !keywordAt("OR"))
          n = Or(n, parseNot(field))
        else continue = false
      }
      n
    }

    private def parseNot(field: Option[String]): Node =
      if (keywordAt("NOT")) { eat("NOT"); Not(parseNot(field)) }
      else parsePrimary(field)

    private def parsePrimary(field: Option[String]): Node = {
      ws()
      if (peek == '(') { i += 1; val n = parseOr(field); ws()
        if (peek != ')') fail("expected ')'"); i += 1; n }
      else parseClause(field)
    }

    private def ident(): String = {
      ws()
      val start = i
      while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' ||
        s.charAt(i) == '.')) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }

    private def bareValue(): String = {
      ws()
      val start = i
      while (i < s.length && !s.charAt(i).isWhitespace &&
        !"()[]{}:".contains(s.charAt(i))) i += 1
      if (i == start) fail("expected value")
      s.substring(start, i)
    }

    private def quoted(): String = {
      i += 1 // opening "
      val start = i
      while (i < s.length && s.charAt(i) != '"') i += 1
      if (i >= s.length) fail("unterminated quote")
      val v = s.substring(start, i); i += 1; v
    }

    private def parenValues(): Seq[String] = {
      ws(); if (peek != '(') fail("expected '('"); i += 1
      val out = Seq.newBuilder[String]
      ws()
      while (peek != ')') {
        out += (if (peek == '"') quoted() else bareValue())
        ws()
      }
      i += 1
      out.result()
    }

    private def parseClause(fieldCtx: Option[String]): Node = {
      ws()
      val mark = i
      val name = if (peek == '"' || peek == '/' || peek == '[' || peek == '{') null
                 else { val id = ident(); ws(); if (peek == ':') id else { i = mark; null } }
      val field = Option(name).orElse(fieldCtx)
        .getOrElse(fail("bare term without a field (no default field in standard mode)"))
      if (name != null) i += 1 // consume ':'
      ws()
      peek match {
        case '"' => Phrase(field, quoted())
        case '/' =>
          i += 1; val start = i
          while (i < s.length && s.charAt(i) != '/') i += 1
          if (i >= s.length) fail("unterminated regexp")
          val p = s.substring(start, i); i += 1; Regexp(field, p)
        case '[' | '{' =>
          val loInc = peek == '['; i += 1
          val lo = bareValue(); ws()
          if (!keywordAt("TO")) fail("expected TO in range"); eat("TO")
          val hi = bareValue(); ws()
          val hiInc = peek match {
            case ']' => true
            case '}' => false
            case _   => fail("expected ] or } closing range")
          }
          i += 1
          Range(field, Some(lo).filter(_ != "*"), Some(hi).filter(_ != "*"), loInc, hiInc)
        case '(' if name != null =>
          // field:(...) grouping: inner bare terms bind to this field
          i += 1; val n = parseOr(Some(field)); ws()
          if (peek != ')') fail("expected ')'"); i += 1; n
        case _ =>
          if (keywordAt("IN") && afterKeywordParen("IN")) { eat("IN"); ListIn(field, parenValues()) }
          else if (keywordAt("ANY") && afterKeywordParen("ANY")) { eat("ANY"); AnyOf(field, parenValues()) }
          else if (keywordAt("ALL") && afterKeywordParen("ALL")) { eat("ALL"); AllOf(field, parenValues()) }
          else if (keywordAt("EXACT") && afterKeywordParen("EXACT")) {
            eat("EXACT"); val vs = parenValues(); Exact(field, vs.mkString(" "))
          } else {
            val v = bareValue()
            if (v.endsWith("*") && !v.dropRight(1).exists(c => c == '*' || c == '?'))
              Prefix(field, v.dropRight(1))
            else if (v.exists(c => c == '*' || c == '?')) Wildcard(field, v)
            else Term(field, v)
          }
      }
    }

    private def afterKeywordParen(kw: String): Boolean = {
      var j = i + kw.length
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      j < s.length && s.charAt(j) == '('
    }
  }

  // ---- compiler: AST -> Spark SQL boolean expression ----

  private def sLit(v: String): String = "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def fld(f: String): String = "`" + f.replace("`", "``") + "`"
  private def toks(f: String): String = s"tokenize(${fld(f)})"
  private def safe(pred: String): String = s"coalesce($pred, false)"
  private def isNum(v: String): Boolean = scala.util.Try(v.toDouble).isSuccess

  def toSql(n: Node): String = n match {
    case Term(f, v)    => safe(s"array_contains(${toks(f)}, ${sLit(v.toLowerCase)})")
    case Phrase(f, v)  => safe(s"match_phrase(${fld(f)}, ${sLit(v)})")
    case Prefix(f, v)  => safe(s"exists(${toks(f)}, t -> startswith(t, ${sLit(v.toLowerCase)}))")
    case Wildcard(f, v) =>
      val pat = v.toLowerCase.replace("%", "\\%").replace("_", "\\_")
        .replace('*', '%').replace('?', '_')
      safe(s"exists(${toks(f)}, t -> t LIKE ${sLit(pat)})")
    case Regexp(f, v)  => safe(s"exists(${toks(f)}, t -> t rlike ${sLit(v)})")
    case Range(f, lo, hi, loInc, hiInc) =>
      val numeric = (lo.toSeq ++ hi.toSeq).forall(isNum) && (lo.nonEmpty || hi.nonEmpty)
      val ref = if (numeric) s"CAST(${fld(f)} AS DOUBLE)" else fld(f)
      // Re-format through the parsed double and quote — java's toDouble
      // accepts spellings ('Infinity', '0x1p3', '1f') that are not valid
      // SQL tokens, so the raw token must never be spliced into the text.
      def bound(v: String) = if (numeric) s"CAST(${sLit(v.toDouble.toString)} AS DOUBLE)" else sLit(v)
      val parts =
        lo.map(v => s"$ref ${if (loInc) ">=" else ">"} ${bound(v)}").toSeq ++
        hi.map(v => s"$ref ${if (hiInc) "<=" else "<"} ${bound(v)}").toSeq
      if (parts.isEmpty) "true" else safe(parts.mkString("(", " AND ", ")"))
    case ListIn(f, vs) =>
      safe(s"arrays_overlap(${toks(f)}, array(${vs.map(v => sLit(v.toLowerCase)).mkString(", ")}))")
    case AnyOf(f, vs)  => safe(s"match_any(${fld(f)}, ${sLit(vs.mkString(" "))})")
    case AllOf(f, vs)  => safe(s"match_all(${fld(f)}, ${sLit(vs.mkString(" "))})")
    case Exact(f, v)   => safe(s"${fld(f)} = ${sLit(v)}")
    case And(l, r)     => s"(${toSql(l)} AND ${toSql(r)})"
    case Or(l, r)      => s"(${toSql(l)} OR ${toSql(r)})"
    case Not(x)        => s"(NOT ${toSql(x)})"
  }

  /** DataFrame-API entry point: search("text:rock AND lang:EXACT(en)").
    * The compiled predicate is tagged with the DSL so a score() in the
    * same query can recover the terms (ScoreRewriteRule strips the
    * transparent tag before physical planning either way). */
  def search(dsl: String): Column = {
    parse(dsl) // fail fast on syntax errors at call site
    expr(s"search(${sLit(dsl)})") // resolves through the registered
    // builder, so the predicate carries the score()-enabling tag
  }

  /** Catalyst FunctionBuilder for SQL `search('<dsl>')` — the DSL must
    * be a string literal (the FE has the same constraint: the plan is
    * built at analysis time). Field names inside the DSL resolve as
    * unresolved attributes against the query scope, exactly like
    * RewriteSearchToSlots binds slots. */
  def builder(args: Seq[Expression]): Expression = {
    require(args.length == 1, "search() takes exactly one DSL string")
    val dsl = args.head match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v, _) if v != null => v.toString
      case other => throw new IllegalArgumentException(
        s"search() requires a literal DSL string, got $other")
    }
    graft.plans.ScoreRewrite.SearchTag(dsl,
      CatalystSqlParser.parseExpression(toSql(parse(dsl))))
  }

  /** `score()` — the reference's BM25 relevance surface
    * (be/src/exprs/function/function_score.cpp) as a distributed
    * pipeline over (id, text): tokenize -> per-doc TF -> tiny DF/avgdl
    * sides broadcast -> Lucene-form BM25 sum per document. Returns
    * (id, score) for documents matching at least one query term;
    * callers join it back or top-k it. One fact-table pass; every
    * other side is a broadcast — the same scale shape as ds_bm25. */
  def score(docs: DataFrame, idCol: String, textCol: String, query: String,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.functions._
    val qterms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    val toks = docs
      .select(col(idCol).as("id"),
        explode(filter(split(lower(col(textCol)), " +"), t => length(t) > 0)).as("tok"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("len"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("len")).as("avgdl"))
    val tf = toks.where(col("tok").isin(qterms: _*))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(countDistinct(col("id")).as("df"))
    tf.join(broadcast(df), "tok")
      .join(dl, "id")
      .crossJoin(broadcast(stats))
      .groupBy(col("id"))
      .agg(sum(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * col("tf") * lit(k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("len") / col("avgdl")))).as("score"))
  }
}
