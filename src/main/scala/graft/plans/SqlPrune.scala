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

  /** One extracted comparison on the partition column, evaluated
    * against the STORED partition-value string (what the writers stamp:
    * `col.cast("string")`). Unparseable values are conservatively
    * KEPT for numeric comparisons — pruning must never be lossy. */
  private def cmp(op: String, lit: Literal): String => Boolean = {
    def num(s: String): Option[BigDecimal] =
      try Some(BigDecimal(s.trim)) catch { case _: NumberFormatException => None }
    lit match {
      case StrLit(v) => op match {
        case "=" => pv => pv == v || ((num(pv), num(v)) match {
          case (Some(a), Some(b)) => a == b
          case _ => false
        })
        case _ => _ => true // string inequality: not extracted (see below)
      }
      case NumLit(v) => pv => num(pv) match {
        case None => true // cast-to-null rows die in the WHERE anyway
        case Some(n) => op match {
          case "=" => n == v
          case "<" => n < v
          case "<=" => n <= v
          case ">" => n > v
          case ">=" => n >= v
          case _ => true
        }
      }
    }
  }

  private sealed trait Literal
  private final case class StrLit(v: String) extends Literal
  private final case class NumLit(v: BigDecimal) extends Literal

  private val Str = "'([^']*)'"
  private val Num = "(-?\\d+(?:\\.\\d+)?)"
  private def lit(m: String, n: String): Literal =
    if (m != null) StrLit(m) else NumLit(BigDecimal(n))

  /** The literal value strings of the first `=` / `IN` conjunct on
    * `partCol` (same soundness guards as [[partPredicate]]) — what a
    * TRANSFORMED partition spec needs: the transform applies to the
    * literal, then prunes on the stored transformed value. None when
    * no provable equality conjunct exists. */
  def partEqualityValues(sql: String, tableRef: String, partCol: String)
      : Option[Seq[String]] = {
    equalityValues.set(None)
    partPredicate(sql, tableRef, partCol): Unit
    val out = equalityValues.get()
    equalityValues.set(None)
    out
  }
  private val equalityValues =
    new ThreadLocal[Option[Seq[String]]] { override def initialValue = None }

  /** Extract a partition predicate for `partCol` of the table referred
    * to as `tableRef` (e.g. "graft_iceberg.li_x") from `sql`. None =
    * nothing provably extractable; the caller reads unpruned. */
  def partPredicate(sql: String, tableRef: String, partCol: String)
      : Option[String => Boolean] = {
    val masked = maskLiterals(sql)
    val upper = masked.toUpperCase
    // any OR / NOT / CASE anywhere makes textual conjuncts unreliable;
    // set operators split the statement into blocks a single textual
    // WHERE cannot be tied to
    if (Seq("OR", "NOT", "CASE", "UNION", "EXCEPT", "INTERSECT")
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
    val splits = List.newBuilder[Int]
    depth = 0
    var betweenOpen = false
    val clauseUpper = clauseMasked.toUpperCase
    i = 0
    while (i < clauseUpper.length) {
      clauseUpper.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          def word(w: String): Boolean =
            clauseUpper.startsWith(w, i) &&
              (i == 0 || { val c = clauseUpper.charAt(i - 1)
                !c.isLetterOrDigit && c != '_' }) &&
              (i + w.length == clauseUpper.length ||
                { val c = clauseUpper.charAt(i + w.length)
                  !c.isLetterOrDigit && c != '_' })
          if (depth == 0 && word("BETWEEN")) { betweenOpen = true; i += 7 }
          else if (depth == 0 && word("AND")) {
            if (betweenOpen) betweenOpen = false else splits += i
            i += 3
          } else i += 1
      }
    }
    val bounds = (0 +: splits.result().flatMap(s => Seq(s, s + 3))) :+ clauseOrig.length
    val conjuncts = bounds.grouped(2).collect {
      case Seq(a, b) => clauseOrig.substring(a, b).trim
    }.toList

    val alias = aliasOf(masked, tableRef)
    val tableName = tableRef.split("\\.").last
    def colOk(qual: String): Boolean =
      qual == null || qual == tableName || alias.contains(qual)
    val colRe = s"(?:([A-Za-z_]\\w*)\\.)?${java.util.regex.Pattern.quote(partCol)}"
    val eqRe = s"(?is)^$colRe\\s*(=|<=|>=|<|>)\\s*(?:$Str|$Num)$$".r
    val eqFlipRe = s"(?is)^(?:$Str|$Num)\\s*(=|<=|>=|<|>)\\s*$colRe$$".r
    val inRe = s"(?is)^$colRe\\s+IN\\s*\\(([^()]*)\\)$$".r
    val inItemRe = s"(?is)^(?:$Str|$Num)$$".r
    val btRe = s"(?is)^$colRe\\s+BETWEEN\\s+$Num\\s+AND\\s+$Num$$".r
    def flip(op: String): String = op match {
      case "<" => ">" case "<=" => ">=" case ">" => "<" case ">=" => "<="
      case o => o
    }
    def recordEq(vals: Seq[String]): Unit =
      if (equalityValues.get().isEmpty) equalityValues.set(Some(vals))
    val preds = conjuncts.flatMap {
      case eqRe(qual, op, s, n) if colOk(qual) =>
        if (op == "=") recordEq(Seq(if (s != null) s else n))
        Some(cmp(op, lit(s, n)))
      case eqFlipRe(s, n, op, qual) if colOk(qual) =>
        if (op == "=") recordEq(Seq(if (s != null) s else n))
        Some(cmp(flip(op), lit(s, n)))
      case inRe(qual, items) if colOk(qual) =>
        val parsed = items.split(",").map(_.trim).toSeq.map {
          case inItemRe(s, n) => Some((lit(s, n), if (s != null) s else n))
          case _ => None
        }
        if (parsed.exists(_.isEmpty)) None
        else {
          recordEq(parsed.flatten.map(_._2))
          val fs = parsed.flatten.map(p => cmp("=", p._1))
          Some((pv: String) => fs.exists(_(pv)))
        }
      case btRe(qual, loS, hiS) if colOk(qual) =>
        val (loF, hiF) = (cmp(">=", NumLit(BigDecimal(loS))),
          cmp("<=", NumLit(BigDecimal(hiS))))
        Some((pv: String) => loF(pv) && hiF(pv))
      case _ => None
    }
    // drop the always-true placeholders (string inequality)
    val useful = preds
    if (useful.isEmpty) None
    else Some(pv => useful.forall(_(pv)))
  }
}
