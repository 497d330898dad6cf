package graft.plans

/** Conservative partition-predicate extraction from a SQL statement's
  * WHERE clause, feeding the `graft_<fmt>` readers' FILE-LEVEL pruning
  * (the FE-role partition prune every real scan plan gets — reference:
  * fe/fe-core/.../nereids/rules/rewrite/PruneFileScanPartition.java,
  * PruneOlapScanPartition.java). Without this, `SELECT ... WHERE part =
  * 'X'` over a graft_<fmt> table plans EVERY live file and only prunes
  * row groups; at 100 TB that is the difference between opening one
  * partition's footers and opening all of them.
  *
  * Soundness over completeness: a predicate is extracted ONLY when the
  * statement's shape makes the conjunct provably restrict the scanned
  * table — exactly one WHERE clause, no OR/NOT/CASE anywhere (any of
  * which could make a textual conjunct non-restricting), conjuncts
  * split at paren depth 0, and the column unqualified or qualified by
  * the scanned table's name/alias. Anything else returns None and the
  * read stays unpruned-but-correct. Extraction never changes results:
  * the WHERE still runs above the scan; pruning only drops files whose
  * partition value provably fails the conjunct.
  *
  * String literals are masked FIRST (same-length, so offsets align),
  * making the whole route immune to `graft_iceberg.x` or `part = 'A'`
  * appearing inside quoted text. */
object SqlPrune {

  /** Blank the contents of '...'/"..." literals (keeping the quotes)
    * with spaces — same length as the input, so positions found on the
    * masked text index directly into the original. Doubled quotes
    * inside a literal ('it''s') stay masked. */
  def maskLiterals(sql: String): String = {
    val out = sql.toCharArray
    var i = 0
    var quote: Char = 0
    while (i < out.length) {
      val c = out(i)
      if (quote == 0) {
        if (c == '\'' || c == '"') quote = c
      } else if (c == quote) {
        // doubled quote = escaped quote: both chars are literal content
        if (i + 1 < out.length && out(i + 1) == quote) {
          out(i) = ' '; out(i + 1) = ' '; i += 1
        } else quote = 0
      } else out(i) = ' '
      i += 1
    }
    new String(out)
  }

  private val StopKeywords = Set(
    "WHERE", "GROUP", "ORDER", "HAVING", "QUALIFY", "LIMIT", "WINDOW",
    "UNION", "EXCEPT", "INTERSECT", "JOIN", "LEFT", "RIGHT", "FULL",
    "INNER", "CROSS", "ON", "USING", "FOR", "AS", "AND", "OR", "NOT",
    "SELECT", "FROM", "SET", "WHEN", "THEN", "VALUES")

  /** The alias (or absence) following `tableRef` in the FROM text —
    * used to accept qualified conjunct columns. */
  def aliasOf(masked: String, tableRef: String): Option[String] = {
    val re = (java.util.regex.Pattern.quote(tableRef) +
      "\\s+(?:AS\\s+)?([A-Za-z_]\\w*)").r
    re.findFirstMatchIn(masked)
      .map(_.group(1))
      .filterNot(a => StopKeywords.contains(a.toUpperCase))
  }

  /** Cast a string through Spark's OWN cast to the column's type —
    * TRY mode, so unparseable input is None, never an exception. This
    * is what makes date/timestamp/boolean pruning spelling-insensitive:
    * the stored value ('2024-01-03 10:00:00') and a non-canonical
    * literal ('2024-01-03T10:00:00') normalize to the same typed value
    * exactly as the WHERE's own comparison would. */
  private[plans] def castTo(colType: String, s: String): Option[Any] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal => CLit}
    val dt =
      try org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(colType)
      catch { case scala.util.control.NonFatal(_) => return None }
    scala.util.Try(Cast(
      CLit(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType),
      dt, Some("UTC"), EvalMode.TRY).eval()).toOption.flatMap(Option(_))
  }

  /** Types whose STRING literals must normalize through [[castTo]]
    * before comparing against the stored cast-to-string partition value
    * — raw text comparison on these silently prunes live files when the
    * literal is a valid non-canonical spelling. */
  private def isTemporalish(colType: String): Boolean =
    colType == "date" || colType == "boolean" || colType.startsWith("timestamp")

  private def ordered(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: java.lang.Integer, y: java.lang.Integer) => Some(x.compareTo(y))
    case (x: java.lang.Long, y: java.lang.Long) => Some(x.compareTo(y))
    case (x: java.lang.Boolean, y: java.lang.Boolean) => Some(x.compareTo(y))
    case _ => None // unknown representation: caller keeps the file
  }

  private def opHolds(op: String, c: Int): Boolean = op match {
    case "=" => c == 0
    case "<" => c < 0
    case "<=" => c <= 0
    case ">" => c > 0
    case ">=" => c >= 0
    case "<>" | "!=" => c != 0 // a file whose stored value IS the
    // excluded literal holds only rows the WHERE filters out (NULLs
    // fail <> too) — pruning it is sound
    case _ => true
  }

  /** One extracted comparison on the partition column, evaluated
    * against the STORED partition-value string (what the writers stamp:
    * `col.cast("string")`). Unparseable values are conservatively
    * KEPT — pruning must never be lossy. `colType` is the partition
    * column's declared type (simpleString); "" = unknown, which keeps
    * the legacy raw/numeric comparison for equality only. */
  private def cmp(op: String, lit: Literal, colType: String): String => Boolean = {
    def num(s: String): Option[BigDecimal] =
      try Some(BigDecimal(s.trim)) catch { case _: NumberFormatException => None }
    lit match {
      case StrLit(_) if colType.startsWith("timestamp") &&
          op != "=" && op != "<>" && op != "!=" =>
        // wall-clock order can disagree with instant order inside a DST
        // fall-back hour — timestamp RANGES are not extracted (equality
        // and exclusion are safe: both need only instant-equality,
        // which the normalizing cast compares exactly)
        _ => true
      case StrLit(v) if isTemporalish(colType) =>
        castTo(colType, v) match {
          case None => _ => true // literal the type cannot parse: no prune
          case Some(lv) => pv => castTo(colType, pv) match {
            case None => true // unparseable stored value: keep
            case Some(sv) => ordered(sv, lv).forall(opHolds(op, _))
          }
        }
      case StrLit(v) if colType == "string" || colType.startsWith("char") ||
          colType.startsWith("varchar") =>
        // stored value IS the exact string: lexicographic compare is
        // the column's own ordering, so ranges extract too
        pv => opHolds(op, pv.compareTo(v))
      case StrLit(v) => op match {
        case "=" => pv => pv == v || ((num(pv), num(v)) match {
          case (Some(a), Some(b)) => a == b
          case _ => false
        })
        case _ => _ => true // unknown-typed string inequality: not extracted
      }
      case NumLit(v) => pv => num(pv) match {
        case None => true // cast-to-null rows die in the WHERE anyway
        case Some(n) => opHolds(op, n.compare(v))
      }
    }
  }

  private sealed trait Literal
  private final case class StrLit(v: String) extends Literal
  private final case class NumLit(v: BigDecimal) extends Literal

  /** Whether a `<>`/`!=` conjunct can prune: only under an exact
    * equality notion — numeric literals compare numerically, string
    * literals need a string-family or temporal/boolean column type. */
  private def exclusionExtractable(l: Literal, colType: String): Boolean =
    l match {
      case NumLit(_) => true
      case StrLit(_) => isTemporalish(colType) || colType == "string" ||
        colType.startsWith("char") || colType.startsWith("varchar")
    }

  private val Str = "'([^']*)'"
  private val Num = "(-?\\d+(?:\\.\\d+)?)"
  private def lit(m: String, n: String): Literal =
    if (m != null) StrLit(m) else NumLit(BigDecimal(n))

  /** Everything the extractor can prove about the partition column
    * from one statement: a keep-this-stored-value predicate, the
    * equality literals (what bucket/truncate transform pruning needs),
    * and the range bounds as (op, literal) pairs (what MONOTONE
    * transform pruning — year/month/day, truncate — needs: a bound on
    * the source column becomes an inclusive bound on its truncation). */
  final case class PruneInfo(pred: String => Boolean,
                             eqVals: Option[Seq[String]],
                             bounds: Seq[(String, String)])

  /** The literal value strings of the first `=` / `IN` / single-column
    * OR-disjunction conjunct on `partCol` (same soundness guards as
    * [[partPredicate]]) — what a TRANSFORMED partition spec needs: the
    * transform applies to the literal, then prunes on the stored
    * transformed value. None when no provable equality conjunct
    * exists. */
  def partEqualityValues(sql: String, tableRef: String, partCol: String,
                         colType: String = ""): Option[Seq[String]] =
    partPruneInfo(sql, tableRef, partCol, colType).flatMap(_.eqVals)

  /** [[partPruneInfo]]'s predicate alone. */
  def partPredicate(sql: String, tableRef: String, partCol: String,
                    colType: String = ""): Option[String => Boolean] =
    partPruneInfo(sql, tableRef, partCol, colType).map(_.pred)

  /** Extract a partition predicate for `partCol` of the table referred
    * to as `tableRef` (e.g. "graft_iceberg.li_x") from `sql`. None =
    * nothing provably extractable; the caller reads unpruned.
    *
    * Soundness model: the WHERE clause splits into depth-0 AND
    * conjuncts; a conjunct the patterns below do not match contributes
    * NOTHING (never bails the others — an ANDed conjunct cannot
    * un-restrict its siblings, and NOT/CASE bind tighter than AND so
    * they stay inside their own conjunct). A depth-0 OR, by contrast,
    * breaks the conjunction shape entirely: the clause is then used
    * only if it is, in full, a single-column disjunction of equalities
    * (`p='a' OR p='b'` ≡ `p IN ('a','b')`); anything else returns
    * None. */
  def partPruneInfo(sql: String, tableRef: String, partCol: String,
                    colType: String = ""): Option[PruneInfo] = {
    val masked = maskLiterals(sql)
    val upper = masked.toUpperCase
    // set operators split the statement into blocks a single textual
    // WHERE cannot be tied to
    if (Seq("UNION", "EXCEPT", "INTERSECT")
        .exists(k => s"\\b$k\\b".r.findFirstIn(upper).isDefined)) return None
    val whereStarts = "\\bWHERE\\b".r.findAllMatchIn(upper).map(_.end).toList
    if (whereStarts.size != 1) return None
    val start = whereStarts.head
    def depthAt(pos: Int): Int = {
      var d = 0; var j = 0
      while (j < pos) {
        masked.charAt(j) match {
          case '(' => d += 1; case ')' => d -= 1; case _ =>
        }
        j += 1
      }
      d
    }
    // the WHERE and the table reference must both sit in the TOP query
    // block: a WHERE inside a subquery restricts that subquery, not the
    // scanned table, and a table inside a derived subquery may have its
    // columns re-derived above. A table referenced twice (self-join)
    // shares one temp view — pruning one side would drop the other's
    // rows.
    val refPositions = (java.util.regex.Pattern.quote(tableRef) + "(?!\\w)").r
      .findAllMatchIn(masked).map(_.start).toList
    if (refPositions.size != 1 || depthAt(refPositions.head) != 0 ||
        depthAt(start) != 0) return None
    // clause extent: to the first stop KEYWORD (whole word — '_' is a
    // word char, so "o_ORDERkey" never terminates its own clause) or a
    // depth-dropping ')'
    def wordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
    var depth = 0
    var end = sql.length
    var i = start
    while (i < end) {
      masked.charAt(i) match {
        case '(' => depth += 1
        case ')' => if (depth == 0) end = i else depth -= 1
        case _ =>
          if (depth == 0) {
            val isStop = Seq("GROUP", "ORDER", "HAVING", "QUALIFY", "LIMIT",
              "WINDOW", "UNION", "EXCEPT", "INTERSECT").exists { k =>
              upper.startsWith(k, i) &&
                (i == 0 || !wordChar(upper.charAt(i - 1))) &&
                (i + k.length >= upper.length ||
                  !wordChar(upper.charAt(i + k.length)))
            }
            if (isStop) end = i
          }
      }
      i += 1
    }
    // split on depth-0 ANDs (an AND completing a BETWEEN is not a split)
    val clauseMasked = masked.substring(start, end)
    val clauseOrig = sql.substring(start, end)
    val clauseUpper = clauseMasked.toUpperCase
    def wordAt(text: String, w: String, at: Int): Boolean =
      text.startsWith(w, at) &&
        (at == 0 || { val c = text.charAt(at - 1)
          !c.isLetterOrDigit && c != '_' }) &&
        (at + w.length == text.length ||
          { val c = text.charAt(at + w.length)
            !c.isLetterOrDigit && c != '_' })
    def splitOn(word: String): List[String] = {
      val splits = List.newBuilder[Int]
      var depth = 0
      var betweenOpen = false
      var j = 0
      while (j < clauseUpper.length) {
        clauseUpper.charAt(j) match {
          case '(' => depth += 1; j += 1
          case ')' => depth -= 1; j += 1
          case _ =>
            if (depth == 0 && wordAt(clauseUpper, "BETWEEN", j)) {
              betweenOpen = true; j += 7
            } else if (depth == 0 && wordAt(clauseUpper, "AND", j) &&
                betweenOpen) {
              betweenOpen = false; j += 3
            } else if (depth == 0 && wordAt(clauseUpper, word, j)) {
              splits += j; j += word.length
            } else j += 1
        }
      }
      val bs = (0 +: splits.result().flatMap(s => Seq(s, s + word.length))) :+
        clauseOrig.length
      bs.grouped(2).collect { case Seq(a, b) =>
        clauseOrig.substring(a, b).trim }.toList
    }
    def hasDepth0(word: String): Boolean = {
      var depth = 0
      var j = 0
      while (j < clauseUpper.length) {
        clauseUpper.charAt(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => if (depth == 0 && wordAt(clauseUpper, word, j)) return true
        }
        j += 1
      }
      false
    }

    // ANSI typed literals (`TIMESTAMP '...'` / `DATE '...'`): strip the
    // prefix so the plain-string patterns match — but ONLY when the
    // prefix agrees with the column's declared type, where the
    // comparison semantics are the string-cast ones cmp() implements:
    // TIMESTAMP literals require a timestamp column (a `d < TIMESTAMP
    // '.. 10:00'` on a DATE column would prune the boundary date the
    // WHERE still matches); DATE literals promote to midnight on
    // timestamp columns exactly like Spark's coercion. A disallowed
    // prefix stays in the text, so the conjunct matches nothing and
    // contributes nothing — never unsound.
    def typedPrefixOk(prefix: String): Boolean = prefix match {
      case "TIMESTAMP" => colType.startsWith("timestamp")
      case "DATE" => colType == "date" || colType.startsWith("timestamp")
      case _ => false
    }
    def normTyped(text: String): String =
      "(?i)\\b(DATE|TIMESTAMP)\\s+'".r.replaceAllIn(text, m =>
        if (typedPrefixOk(m.group(1).toUpperCase)) "'"
        else java.util.regex.Matcher.quoteReplacement(m.matched))

    val alias = aliasOf(masked, tableRef)
    val tableName = tableRef.split("\\.").last
    def colOk(qual: String): Boolean =
      qual == null || qual == tableName || alias.contains(qual)
    val colRe = s"(?:([A-Za-z_]\\w*)\\.)?${java.util.regex.Pattern.quote(partCol)}"
    val eqRe = s"(?is)^$colRe\\s*(=|<=|>=|<>|!=|<|>)\\s*(?:$Str|$Num)$$".r
    val eqFlipRe = s"(?is)^(?:$Str|$Num)\\s*(=|<=|>=|<>|!=|<|>)\\s*$colRe$$".r
    val inRe = s"(?is)^$colRe\\s+IN\\s*\\(([^()]*)\\)$$".r
    val inItemRe = s"(?is)^(?:$Str|$Num)$$".r
    val btRe = s"(?is)^$colRe\\s+BETWEEN\\s+(?:$Str|$Num)\\s+AND\\s+(?:$Str|$Num)$$".r
    def flip(op: String): String = op match {
      case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<="
      case o => o
    }
    var eqVals: Option[Seq[String]] = None
    val rangeBounds = Seq.newBuilder[(String, String)]
    def recordEq(vals: Seq[String]): Unit =
      if (eqVals.isEmpty) eqVals = Some(vals)
    def rawOf(s: String, n: String): String = if (s != null) s else n

    // a SAME-COLUMN disjunction of equalities (`p='a' OR p='b'`) is an
    // IN in disguise; anything else containing OR proves nothing
    def parseDisjunction(text: String): Option[String => Boolean] = {
      val parts = {
        // depth-0 OR split WITHIN this conjunct's text
        val tU = maskLiterals(text).toUpperCase
        val splits = List.newBuilder[Int]
        var depth = 0
        var j = 0
        while (j < tU.length) {
          tU.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ => if (depth == 0 && wordAt(tU, "OR", j)) splits += j
          }
          j += 1
        }
        val bs = (0 +: splits.result().flatMap(s => Seq(s, s + 2))) :+ text.length
        bs.grouped(2).collect { case Seq(a, b) =>
          text.substring(a, b).trim }.toList
      }
      if (parts.size < 2) return None
      val parsed = parts.map(normTyped).map {
        case eqRe(qual, "=", s, n) if colOk(qual) => Some(rawOf(s, n) -> lit(s, n))
        case eqFlipRe(s, n, "=", qual) if colOk(qual) => Some(rawOf(s, n) -> lit(s, n))
        case _ => None
      }
      if (parsed.exists(_.isEmpty)) None
      else {
        recordEq(parsed.flatten.map(_._1))
        val fs = parsed.flatten.map(p => cmp("=", p._2, colType))
        Some((pv: String) => fs.exists(_(pv)))
      }
    }

    if (hasDepth0("OR")) {
      // the clause is not a conjunction — usable only if it is, whole,
      // a single-column disjunction of equalities
      return parseDisjunction(clauseOrig.trim).map(f =>
        PruneInfo(f, eqVals, Nil))
    }

    val conjuncts = splitOn("AND")
    def stripParens(s: String): String = {
      val t = s.trim
      if (t.startsWith("(") && t.endsWith(")")) {
        // only strip when the parens MATCH each other
        var depth = 0
        var ok = true
        var j = 0
        while (j < t.length - 1) {
          t.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) ok = false
            case _ =>
          }
          j += 1
        }
        if (ok) t.substring(1, t.length - 1).trim else t
      } else t
    }
    val preds = conjuncts.flatMap { c0 =>
      normTyped(stripParens(c0)) match {
        case eqRe(qual, op, s, n) if colOk(qual) =>
          val isExcl = op == "<>" || op == "!="
          if (op == "=") recordEq(Seq(rawOf(s, n)))
          else if (!isExcl) rangeBounds += ((op, rawOf(s, n)))
          // exclusion needs an EXACT equality notion: extracted only
          // when the column type pins one (string family, numeric,
          // temporal via the normalizing cast) — unknown types keep
          // the '5.0'-vs-5 ambiguity, so the conjunct proves nothing
          if (isExcl && !exclusionExtractable(lit(s, n), colType)) None
          else Some(cmp(op, lit(s, n), colType))
        case eqFlipRe(s, n, op, qual) if colOk(qual) =>
          val isExcl = op == "<>" || op == "!="
          if (op == "=") recordEq(Seq(rawOf(s, n)))
          else if (!isExcl) rangeBounds += ((flip(op), rawOf(s, n)))
          if (isExcl && !exclusionExtractable(lit(s, n), colType)) None
          else Some(cmp(flip(op), lit(s, n), colType))
        case inRe(qual, items) if colOk(qual) =>
          val parsed = items.split(",").map(_.trim).toSeq.map {
            case inItemRe(s, n) => Some((lit(s, n), rawOf(s, n)))
            case _ => None
          }
          if (parsed.exists(_.isEmpty)) None
          else {
            recordEq(parsed.flatten.map(_._2))
            val fs = parsed.flatten.map(p => cmp("=", p._1, colType))
            Some((pv: String) => fs.exists(_(pv)))
          }
        case btRe(qual, loS, loN, hiS, hiN) if colOk(qual) =>
          rangeBounds += ((">=", rawOf(loS, loN)))
          rangeBounds += (("<=", rawOf(hiS, hiN)))
          val (loF, hiF) = (cmp(">=", lit(loS, loN), colType),
            cmp("<=", lit(hiS, hiN), colType))
          Some((pv: String) => loF(pv) && hiF(pv))
        case c if maskLiterals(c).toUpperCase.matches("(?s).*\\bOR\\b.*") =>
          // a parenthesized same-column disjunction inside the AND
          // chain; any other OR-bearing conjunct proves nothing (and
          // cannot un-restrict its siblings)
          parseDisjunction(stripParens(c0))
        case _ => None
      }
    }
    if (preds.isEmpty) None
    else Some(PruneInfo(pv => preds.forall(_(pv)), eqVals,
      rangeBounds.result()))
  }
}
