package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SqlPrune

/** plans/SqlPrune.scala — the conservative WHERE-conjunct extractor
  * feeding graft_<fmt> file-level pruning. The contract under test:
  * every extraction is provably restricting (soundness), and every
  * unprovable shape returns None (never a wrong prune). */
class SqlPruneSpec extends AnyFunSuite {

  private val T = "graft_iceberg.t"

  private def pred(sql: String, partCol: String = "p") =
    SqlPrune.partPredicate(sql, T, partCol)

  test("literal masking blanks quoted content, preserves length and offsets") {
    val sql = "SELECT 'graft_iceberg.t', \"x WHERE y\", k FROM t WHERE p = 'A''B'"
    val masked = SqlPrune.maskLiterals(sql)
    assert(masked.length == sql.length)
    assert(!masked.contains("graft_iceberg"))
    assert(!masked.toUpperCase.substring(0, 40).contains("WHERE y".toUpperCase))
    assert(masked.contains("WHERE p = '"))
    // the doubled quote stays inside the literal
    assert(masked.endsWith("'    '"))
  }

  test("equality, IN, numeric ranges and BETWEEN extract") {
    val eq = pred(s"SELECT * FROM $T WHERE p = 'A' AND k > 3").get
    assert(eq("A") && !eq("B"))
    val in = pred(s"SELECT * FROM $T WHERE p IN ('A', 'C')").get
    assert(in("A") && in("C") && !in("B"))
    val rng = pred(s"SELECT k FROM $T WHERE p >= 10 AND p < 20", "p").get
    assert(rng("10") && rng("19") && !rng("20") && !rng("9"))
    val bt = pred(s"SELECT k FROM $T WHERE p BETWEEN 5 AND 7 AND k = 1").get
    assert(bt("5") && bt("7") && !bt("8") && !bt("4"))
    val flip = pred(s"SELECT * FROM $T WHERE 'A' = p").get
    assert(flip("A") && !flip("B"))
    val flipCmp = pred(s"SELECT * FROM $T WHERE 10 < p").get
    assert(flipCmp("11") && !flipCmp("10"))
  }

  test("numeric-text equivalence: '5.0' matches 5, unparseable kept") {
    val eq = pred(s"SELECT * FROM $T WHERE p = 5").get
    assert(eq("5") && eq("5.0") && !eq("6"))
    assert(eq("not-a-number"), "unparseable partition values are kept")
    val eqs = pred(s"SELECT * FROM $T WHERE p = '5'").get
    assert(eqs("5") && eqs("5.0") && !eqs("6"))
  }

  test("qualified columns: table name or alias accepted, others rejected") {
    assert(pred(s"SELECT * FROM $T WHERE t.p = 'A'").isDefined)
    assert(pred(s"SELECT * FROM $T x WHERE x.p = 'A'").isDefined)
    assert(pred(s"SELECT * FROM $T AS x WHERE x.p = 'A'").isDefined)
    assert(pred(s"SELECT * FROM $T x, other o WHERE o.p = 'A'").isEmpty,
      "a conjunct on another table's column must not prune")
  }

  test("unprovable shapes return None: OR, NOT, CASE, set ops, subqueries") {
    assert(pred(s"SELECT * FROM $T WHERE p = 'A' OR k = 1").isEmpty)
    assert(pred(s"SELECT * FROM $T WHERE NOT p = 'A'").isEmpty)
    assert(pred(s"SELECT CASE WHEN p = 'A' THEN 1 ELSE 0 END FROM $T").isEmpty)
    assert(pred(s"SELECT * FROM $T WHERE p = 'A' UNION ALL SELECT * FROM u").isEmpty)
    // WHERE inside a subquery restricts the subquery, not the table
    assert(pred(s"SELECT * FROM $T JOIN (SELECT * FROM u WHERE p = 'A') s ON 1=1").isEmpty)
    // two WHEREs: cannot tie either to the scan
    assert(pred(
      s"SELECT * FROM $T WHERE p = 'A' AND k IN (SELECT k FROM u WHERE p = 'B')").isEmpty)
    // self-join shares one temp view — no one-sided prune
    assert(pred(s"SELECT * FROM $T a JOIN $T b ON a.k = b.k WHERE a.p = 'A'").isEmpty)
    // predicate text inside a string literal is not a predicate
    assert(pred(s"SELECT * FROM $T WHERE note = 'p = ''A'''", "p").isEmpty)
    // no WHERE at all
    assert(pred(s"SELECT * FROM $T").isEmpty)
  }

  test("conjuncts on other columns don't block the partition conjunct") {
    val f = pred(
      s"SELECT k, sum(v) FROM $T WHERE k > 10 AND p = 'B' AND v <= 5 GROUP BY k").get
    assert(f("B") && !f("A"))
  }

  test("GROUP/ORDER/LIMIT terminate the clause cleanly") {
    val f = pred(s"SELECT p, count(*) FROM $T WHERE p = 'A' GROUP BY p ORDER BY p LIMIT 5").get
    assert(f("A") && !f("Z"))
  }

  test("column names containing stop-keyword substrings do not truncate the clause") {
    // "o_ORDERkey" contains ORDER after an underscore — '_' is a word
    // char, so the clause must scan past it
    val f = SqlPrune.partPredicate(
      s"SELECT o_orderkey FROM $T WHERE o_orderkey = 7 ORDER BY o_orderkey",
      T, "o_orderkey").get
    assert(f("7") && !f("8"))
    val vals = SqlPrune.partEqualityValues(
      s"SELECT * FROM $T WHERE o_orderkey IN (7, 9) AND x_limit_y = 1",
      T, "o_orderkey")
    assert(vals.contains(Seq("7", "9")))
    // a column literally named with an embedded AND must not split
    assert(SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE a_and_b = 'A'", T, "a_and_b").get("A"))
  }

  test("equality values surface for transform pruning; ranges do not") {
    assert(SqlPrune.partEqualityValues(
      s"SELECT * FROM $T WHERE p = 'X' AND k > 2", T, "p").contains(Seq("X")))
    assert(SqlPrune.partEqualityValues(
      s"SELECT * FROM $T WHERE p > 5", T, "p").isEmpty)
  }

  test("single-column OR disjunction extracts as an IN; mixed OR is None") {
    val f = pred(s"SELECT * FROM $T WHERE p = 'A' OR p = 'B'").get
    assert(f("A") && f("B") && !f("C"))
    assert(SqlPrune.partEqualityValues(
      s"SELECT * FROM $T WHERE p = 'A' OR p = 'B'", T, "p")
      .contains(Seq("A", "B")))
    // parenthesized disjunction inside an AND chain composes
    val g = pred(s"SELECT * FROM $T WHERE (p = 'A' OR p = 'B') AND k > 3").get
    assert(g("A") && g("B") && !g("C"))
    // mixed columns, mixed ops, OR-of-AND: all unprovable
    assert(pred(s"SELECT * FROM $T WHERE p = 'A' OR k = 1").isEmpty)
    assert(pred(s"SELECT * FROM $T WHERE p = 'A' OR p > 3").isEmpty)
    assert(pred(s"SELECT * FROM $T WHERE p = 'A' OR p = 'B' AND k = 1").isEmpty,
      "AND binds tighter than OR — not a pure disjunction")
    // an OR-bearing conjunct on OTHER columns does not block the
    // partition conjunct (it cannot un-restrict an ANDed sibling)
    val h = pred(s"SELECT * FROM $T WHERE (k = 1 OR v = 2) AND p = 'A'").get
    assert(h("A") && !h("B"))
  }

  test("NOT/CASE in other conjuncts don't block; NOT on the column yields nothing") {
    val f = pred(s"SELECT * FROM $T WHERE NOT k = 1 AND p = 'A'").get
    assert(f("A") && !f("B"))
    assert(pred(s"SELECT * FROM $T WHERE NOT (p = 'A' AND k = 1)").isEmpty,
      "a NOT-group containing the column proves nothing")
    assert(pred(s"SELECT * FROM $T WHERE p != 'A'").isEmpty)
    assert(pred(s"SELECT * FROM $T WHERE p NOT IN ('A')").isEmpty)
  }

  test("typed literals normalize through Spark's cast (date/timestamp/boolean)") {
    // non-canonical date spelling matches the stored canonical form
    val d = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p = '2024-1-3'", T, "p", "date").get
    assert(d("2024-01-03") && !d("2024-01-04"))
    // T-separator timestamp matches the stored space-separated form
    val ts = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p = '2024-01-03T10:00:00'", T, "p",
      "timestamp").get
    assert(ts("2024-01-03 10:00:00") && !ts("2024-01-03 10:00:01"))
    // timestamp RANGES are not extracted (DST fall-back caveat):
    // everything is kept
    val tsr = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p >= '2024-01-03' AND k = 1", T, "p",
      "timestamp")
    assert(tsr.forall(f => f("1999-01-01")), "timestamp range must not prune")
    // date ranges DO extract
    val dr = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p >= '2024-01-03' AND p < '2024-02-01'",
      T, "p", "date").get
    assert(dr("2024-01-03") && dr("2024-01-31") && !dr("2024-02-01") &&
      !dr("2024-01-02"))
    val b = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p = 'true'", T, "p", "boolean").get
    assert(b("true") && !b("false"))
    // an unparseable stored value is conservatively kept
    assert(d("not-a-date"))
  }

  test("ANSI typed literals: prefix strips when it agrees with the column type") {
    // TIMESTAMP '...' on a timestamp column: bounds surface for
    // monotone-transform pruning (the identity pred stays keep-all —
    // the DST caveat)
    val info = SqlPrune.partPruneInfo(
      s"SELECT * FROM $T WHERE p >= TIMESTAMP '2024-01-05 00:00:00' " +
        "AND p < TIMESTAMP '2024-01-08 00:00:00'", T, "p", "timestamp").get
    assert(info.bounds.toSet ==
      Set((">=", "2024-01-05 00:00:00"), ("<", "2024-01-08 00:00:00")))
    // DATE '...' promotes to midnight on a timestamp column (Spark's
    // own coercion) — equality extracts
    val de = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p = DATE '2024-01-05'", T, "p",
      "timestamp").get
    assert(de("2024-01-05 00:00:00") && !de("2024-01-05 10:00:00"))
    // TIMESTAMP '...' on a DATE column must NOT extract: `d < TIMESTAMP
    // '2024-01-05 10:00'` matches d=2024-01-05 rows the date-cast
    // comparison would prune
    val bad = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p < TIMESTAMP '2024-01-05 10:00:00'",
      T, "p", "date")
    assert(bad.forall(f => f("2024-01-05")),
      "a type-mismatched typed literal must not prune the boundary value")
    // TIMESTAMP prefix on a STRING column: lexicographic compare would
    // be against the wrong ordering — not extracted
    val badStr = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p = TIMESTAMP '2024-01-05 10:00:00'",
      T, "p", "string")
    assert(badStr.forall(f => f("anything")),
      "typed literals on a string column must not prune")
    // typed literals inside IN lists
    val inb = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p IN (DATE '2024-01-05', DATE '2024-01-07')",
      T, "p", "date").get
    assert(inb("2024-01-05") && inb("2024-01-07") && !inb("2024-01-06"))
  }

  test("<> exclusion extracts: the excluded partition prunes, others stay") {
    val f = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p <> '7' AND k = 1", T, "p", "string").get
    assert(!f("7") && f("6") && f("8"))
    // != spelling, flipped sides
    val g = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE '7' != p", T, "p", "string").get
    assert(!g("7") && g("6"))
    // numeric exclusion ('5.0'-vs-5 equivalence rides the same compare)
    val h = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p <> 5", T, "p", "int").get
    assert(!h("5") && h("4"))
    // timestamp exclusion normalizes through the cast like equality
    val ts = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p != '2024-01-03T10:00:00'", T, "p",
      "timestamp").get
    assert(!ts("2024-01-03 10:00:00") && ts("2024-01-03 10:00:01"))
    // exclusion is NOT a range bound (monotone transforms must not see
    // it) and records no equality values
    val info = SqlPrune.partPruneInfo(
      s"SELECT * FROM $T WHERE p <> '7'", T, "p", "string").get
    assert(info.bounds.isEmpty && info.eqVals.isEmpty)
    // unknown-typed exclusion stays unextracted ('5.0' vs '5' ambiguity)
    val u = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p <> '5'", T, "p", "")
    assert(u.forall(x => x("5.0") && x("5")))
  }

  test("string-typed ranges extract lexicographically") {
    val f = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p >= 'B' AND p < 'D'", T, "p", "string").get
    assert(f("B") && f("C") && !f("A") && !f("D"))
    val bt = SqlPrune.partPredicate(
      s"SELECT * FROM $T WHERE p BETWEEN 'B' AND 'C'", T, "p", "string").get
    assert(bt("B") && bt("C") && !bt("A") && !bt("D"))
    // unknown column type: string inequality stays unextracted (kept)
    val u = pred(s"SELECT * FROM $T WHERE p >= 'B' AND p = 'C'").get
    assert(u("C") && !u("B"), "only the equality half prunes")
  }
}
