package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** QUALIFY clause support (reference: nereids/trees/plans/logical/
  * LogicalQualify.java + rules/analysis/QualifyToFilter.java +
  * FillUpQualifyMissingSlot.java — Doris accepts Snowflake-style
  * `QUALIFY <predicate>` filtering AFTER window evaluation).
  *
  * Spark's parser has no QUALIFY, so this is a pre-parse SQL text
  * rewrite injected as a delegating [[ParserInterface]]:
  *
  * {{{
  * SELECT <sel> FROM <rest> QUALIFY <cond> [ORDER BY ...]
  * ==>
  * SELECT * EXCEPT(__graft_qualify) FROM
  *   (SELECT <sel>, (<cond>) AS __graft_qualify FROM <rest>) __graft_qualify_src
  * WHERE __graft_qualify [ORDER BY ...]
  * }}}
  *
  * The predicate is computed as one extra column of the original block —
  * so it may reference window expressions directly, select-list aliases
  * (Spark's lateral column alias resolution), and base columns not in
  * the select list (the reference's FillUpQualifyMissingSlot case) —
  * then applied as a plain filter above, and the helper column dropped
  * with star-EXCEPT. Works inside CTE bodies, subqueries, and on the
  * right branch of set operations (the rewrite binds QUALIFY to its own
  * query block, like the reference grammar).
  *
  * Limitations (documented divergence): `SELECT DISTINCT ... QUALIFY`
  * falls back to a double-wrap where the predicate is evaluated over
  * the distinct output and may only reference output columns (the
  * reference fills missing slots before DISTINCT, which changes the
  * distinct set — our form is the standard Snowflake semantics).
  */
object QualifySql {

  private val Helper = "__graft_qualify"

  /** Rewrite all QUALIFY clauses in `sql`; returns input unchanged when
    * none are present (fast path — no scanning cost per query). */
  def rewrite(sql: String): String = {
    // cheap pre-filter: the full scanner only runs when the token bytes
    // exist at all (hot path: every spark.sql() goes through here)
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    if (!up.contains("QUALIFY")) sql else rewriteBlock(sql)
  }

  // ---- lexical scanning ------------------------------------------------

  /** flags(i) == true when s(i) is at paren-depth 0 of this block and
    * outside string literals, quoted identifiers, and comments. */
  private[plans] def topLevelFlags(s: String): Array[Boolean] = {
    val flags = new Array[Boolean](s.length)
    var depth = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          // skip the quoted run (doubled quote chars escape themselves)
          val q = c
          var j = i + 1
          var done = false
          while (j < s.length && !done) {
            if (s.charAt(j) == q) {
              if (j + 1 < s.length && s.charAt(j + 1) == q) j += 2
              else { done = true }
            } else j += 1
          }
          i = math.min(j, s.length - 1)
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          var j = i + 2
          while (j < s.length && s.charAt(j) != '\n') j += 1
          i = math.min(j, s.length - 1)
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          i = if (end < 0) s.length - 1 else end + 1
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) flags(i) = true
        case _ => if (depth == 0) flags(i) = true
      }
      i += 1
    }
    flags
  }

  private[plans] def isWord(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** first depth-0 occurrence of keyword `kw` (case-insensitive, word
    * bounded) in s at or after `from`; -1 if none. */
  private[plans] def findKw(s: String, flags: Array[Boolean], kw: String, from: Int): Int = {
    val n = kw.length
    var i = math.max(from, 0)
    while (i + n <= s.length) {
      if (flags(i) && s.regionMatches(true, i, kw, 0, n) &&
          (i == 0 || !isWord(s.charAt(i - 1))) &&
          (i + n == s.length || !isWord(s.charAt(i + n)))) {
        // every char of the keyword must be top-level (a paren or quote
        // cannot open mid-keyword, so checking the first is enough)
        return i
      }
      i += 1
    }
    -1
  }

  private[plans] def lastKwBefore(s: String, flags: Array[Boolean], kw: String, limit: Int): Int = {
    var at = -1
    var i = findKw(s, flags, kw, 0)
    while (i >= 0 && i < limit) { at = i; i = findKw(s, flags, kw, i + 1) }
    at
  }

  // ---- the rewrite -----------------------------------------------------

  /** Recursively rewrite: first descend into parenthesized sub-blocks
    * that are themselves query blocks, then fix this block's QUALIFY. */
  private def rewriteBlock(s0: String): String = {
    // 1. recurse into ( SELECT ... ) / ( WITH ... ) groups — quote- and
    // comment-aware scan; groups that are not query blocks are copied
    // verbatim (their nested subqueries, if any, sit behind another
    // paren level and get no QUALIFY handling: the reference grammar
    // only allows QUALIFY in a query block either)
    val sb = new StringBuilder
    var i = 0
    while (i < s0.length) {
      val c = s0.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          var j = i + 1
          var done = false
          while (j < s0.length && !done) {
            if (s0.charAt(j) == c) {
              if (j + 1 < s0.length && s0.charAt(j + 1) == c) j += 2 else done = true
            } else j += 1
          }
          val end = math.min(j + 1, s0.length)
          sb.append(s0.substring(i, end)); i = end
        case '-' if i + 1 < s0.length && s0.charAt(i + 1) == '-' =>
          var j = i + 2
          while (j < s0.length && s0.charAt(j) != '\n') j += 1
          sb.append(s0.substring(i, math.min(j + 1, s0.length))); i = math.min(j + 1, s0.length)
        case '/' if i + 1 < s0.length && s0.charAt(i + 1) == '*' =>
          val e = s0.indexOf("*/", i + 2)
          val end = if (e < 0) s0.length else e + 2
          sb.append(s0.substring(i, end)); i = end
        case '(' =>
          val close = matchParen(s0, i)
          if (close < 0) { sb.append(s0.substring(i)); i = s0.length }
          else {
            val inner = s0.substring(i + 1, close)
            val t = inner.dropWhile(_.isWhitespace)
            if (t.regionMatches(true, 0, "SELECT", 0, 6) ||
                t.regionMatches(true, 0, "WITH", 0, 4))
              sb.append('(').append(rewriteBlock(inner)).append(')')
            else sb.append(s0.substring(i, close + 1))
            i = close + 1
          }
        case _ => sb.append(c); i += 1
      }
    }
    var s = sb.toString

    // 2. fix depth-0 QUALIFYs of this block (loop: union branches may
    // each carry one; each rewrite hides its clause inside new parens)
    var guard = 0
    var continue = true
    while (continue && guard < 16) {
      guard += 1
      val flags = topLevelFlags(s)
      val qPos = findKw(s, flags, "QUALIFY", 0)
      if (qPos < 0) continue = false
      else {
        val selStart = lastKwBefore(s, flags, "SELECT", qPos)
        if (selStart < 0) continue = false // not a query block — leave as-is
        else {
          val fromPos = {
            val f = findKw(s, flags, "FROM", selStart)
            if (f >= 0 && f < qPos) f else -1
          }
          // guard against a column literally named qualify in a select
          // list: the keyword must come after the block's FROM when one
          // exists
          if (fromPos < 0 && findKw(s, flags, "FROM", 0) >= 0) continue = false
          else {
            val condStart = qPos + "QUALIFY".length
            val tailStart = Seq("ORDER", "LIMIT", "OFFSET", "UNION",
                "INTERSECT", "EXCEPT", "MINUS")
              .map(k => findKw(s, flags, k, condStart)).filter(_ >= 0)
              .sorted.headOption.getOrElse(s.length)
            val cond = s.substring(condStart, tailStart).trim
            val body = s.substring(selStart, qPos)
            val selHead = body.dropWhile(_.isWhitespace).drop("SELECT".length)
              .dropWhile(_.isWhitespace)
            val distinct = selHead.regionMatches(true, 0, "DISTINCT", 0, 8)
            val inner =
              if (distinct)
                // predicate over the distinct output (Snowflake form)
                s"SELECT *, ($cond) AS $Helper FROM ($body) ${Helper}_d"
              else if (fromPos >= 0)
                s.substring(selStart, fromPos) + s", ($cond) AS $Helper " +
                  s.substring(fromPos, qPos)
              else body + s", ($cond) AS $Helper"
            s = s.substring(0, selStart) +
              s"SELECT * EXCEPT($Helper) FROM ($inner) ${Helper}_src WHERE $Helper " +
              s.substring(tailStart)
          }
        }
      }
    }
    s
  }

  /** index of the ')' matching the '(' at `open` (quote/comment aware). */
  private[plans] def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' | '"' | '`' =>
          val q = s.charAt(i)
          var j = i + 1
          var done = false
          while (j < s.length && !done) {
            if (s.charAt(j) == q) {
              if (j + 1 < s.length && s.charAt(j + 1) == q) j += 2 else done = true
            } else j += 1
          }
          i = j
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          var j = i + 2
          while (j < s.length && s.charAt(j) != '\n') j += 1
          i = j
        case '/' if i + 1 < s.length && s.charAt(i + 1) == '*' =>
          val end = s.indexOf("*/", i + 2)
          i = if (end < 0) s.length else end + 1
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}

/** Delegating parser that applies [[QualifySql.rewrite]] (and the
  * [[RecursiveSql]] WITH RECURSIVE pre-pass, which needs the session to
  * drive the fixpoint) to statement text before handing off to Spark's
  * parser. Injected via `SparkSessionExtensions.injectParser`. */
class GraftSqlParser(delegate: ParserInterface,
                     session: () => org.apache.spark.sql.SparkSession =
                       () => org.apache.spark.sql.SparkSession.active)
    extends ParserInterface {
  private def prePass(sqlText: String): String = {
    val s0 = if (LakehouseSql.handles(sqlText))
      LakehouseSql.rewrite(session(), sqlText)
    else sqlText
    val s = if (RecursiveSql.handles(s0))
      RecursiveSql.rewrite(session(), s0)
    else s0
    QualifySql.rewrite(s)
  }
  override def parsePlan(sqlText: String): LogicalPlan =
    CdcStreamTvf.rewrite(delegate.parsePlan(prePass(sqlText)))
  override def parseQuery(sqlText: String): LogicalPlan =
    CdcStreamTvf.rewrite(delegate.parseQuery(prePass(sqlText)))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}
