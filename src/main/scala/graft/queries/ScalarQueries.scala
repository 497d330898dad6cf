package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Scalar-function battery (SURVEY.md §2.9; reference: FE registry
  * fe/fe-core/.../catalog/BuiltinScalarFunctions.java:601+, BE impls
  * under be/src/exprs/function/). One query per family; every computed
  * column aliased identically on both engines.
  *
  * Dialect bridges encoded in the oracles: DuckDB dayofweek is 0-based
  * (Spark 1-based); DuckDB regexp_replace needs the 'g' flag to match
  * Spark's replace-all; DuckDB lacks initcap/soundex/conv (skipped or
  * emulated); map values are compared via element extraction, never as
  * whole MAP columns (representation differs).
  */
object ScalarQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_string" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          concat_ws("-", col("n_name"), col("n_regionkey")).as("cw"),
          substring(col("n_name"), 2, 3).as("sub"),
          lower(col("n_name")).as("lo"),
          lpad(col("n_name"), 12, ".").as("lp"),
          rpad(col("n_name"), 12, ".").as("rp"),
          translate(col("n_name"), "AEIOU", "aeiou").as("tr"),
          reverse(col("n_name")).as("rev"),
          repeat(substring(col("n_name"), 1, 2), 3).as("rep"),
          length(col("n_name")).as("len"),
          ascii(col("n_name")).as("asc"),
          substring_index(col("n_name"), "A", 1).as("si"),
          instr(col("n_name"), "AN").as("pos"),
          col("n_name").startsWith("A").as("sw"),
          col("n_name").endsWith("A").as("ew"),
          col("n_name").contains("RA").as("ct"),
          trim(lpad(col("n_name"), 10, " ")).as("trm"))
        .orderBy(col("n_nationkey"))
    }),

    "fn_regexp" -> ((s, dir) => {
      t(s, dir, "part").filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          col("p_type").rlike("BRASS|COPPER").as("is_metal"),
          split(col("p_type"), " ").getItem(0).as("t0"))
        .orderBy(col("p_partkey"))
    }),

    "fn_levenshtein" -> ((s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_name").as("a"))
      val n2 = t(s, dir, "nation").select(col("n_name").as("b"))
      n1.crossJoin(n2).filter(col("a") < col("b"))
        .select(col("a"), col("b"), levenshtein(col("a"), col("b")).as("dist"))
        .filter(col("dist") <= 4)
        .orderBy(col("a"), col("b"))
    }),

    "fn_date" -> ((s, dir) => {
      t(s, dir, "orders").filter(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow"),
          dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          to_date(date_trunc("month", col("o_orderdate"))).as("mstart"),
          last_day(col("o_orderdate")).as("mend"),
          date_add(to_date(col("o_orderdate")), 30).as("plus30"),
          add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
          datediff(lit("1998-12-01").cast("date"), to_date(col("o_orderdate"))).as("to_end"),
          unix_timestamp(col("o_orderdate")).as("epoch"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_math" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey"),
          abs(col("c_acctbal")).as("ab"),
          ceil(col("c_acctbal")).as("ce"),
          floor(col("c_acctbal")).as("fl"),
          round(col("c_acctbal"), 1).as("rd"),
          signum(col("c_acctbal")).cast("int").as("sg"),
          round(sqrt(abs(col("c_acctbal"))), 6).as("sq"),
          round(pow(col("c_nationkey"), 2), 1).as("pw"),
          round(exp(col("c_nationkey") / lit(10.0)), 6).as("ex"),
          round(log(col("c_custkey") + 1), 6).as("ln_"),
          round(log10(col("c_custkey") + 1), 6).as("l10"),
          greatest(col("c_acctbal"), lit(0.0)).as("gr"),
          least(col("c_nationkey"), lit(10)).as("le"),
          pmod(col("c_custkey"), lit(7)).as("pm"),
          (col("c_custkey") % 7).as("md"),
          bit_count(col("c_nationkey")).as("bc"),
          hex(col("c_custkey")).as("hx"),
          shiftleft(col("c_nationkey"), 2).as("shl"))
        .orderBy(col("c_custkey"))
    }),

    "fn_hash_digest" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          md5(col("n_name")).as("h_md5"),
          sha2(col("n_name"), 256).as("h_sha256"),
          base64(col("n_name").cast("binary")).as("b64"),
          hex(col("n_name").cast("binary")).as("hx"),
          unbase64(base64(col("n_name").cast("binary"))).cast("string").as("rt"))
        .orderBy(col("n_nationkey"))
    }),

    "fn_array" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .withColumn("words", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("words")).as("n"),
          array_contains(col("words"), "data").as("has_data"),
          array_position(col("words"), "data").cast("int").as("pos_data"),
          array_join(array_distinct(col("words")), "|").as("uniq") /* order = first occurrence */,
          array_join(slice(col("words"), 1, 3), "|").as("first3"),
          array_join(slice(col("words"), 1, 3), "_").as("joined"),
          array_max(col("words")).as("mx"),
          array_min(col("words")).as("mn"),
          array_join(sort_array(array_distinct(col("words"))), "|").as("sorted_uniq"),
          element_at(col("words"), 1).as("w1"),
          element_at(col("words"), -1).as("wlast"),
          array_join(reverse(slice(col("words"), 1, 3)), "|").as("rev3"),
          array_join(flatten(array(slice(col("words"), 1, 2), slice(col("words"), 3, 1))), "|").as("flat3"),
          array_join(array_repeat(element_at(col("words"), 1), 2), "|").as("rep2"))
        .orderBy(col("doc_id"))
    }),

    // higher-order functions (reference: be/src/exprs/lambda_function/).
    "fn_array_hof" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT doc_id,
          array_join(transform(ws, w -> CAST(length(w) AS STRING)), '|') AS lens,
          array_join(filter(ws, w -> length(w) > 4), '|') AS longw,
          exists(ws, w -> w = 'data') AS has_data,
          forall(ws, w -> length(w) > 1) AS all_long,
          CAST(aggregate(ws, 0, (acc, w) -> acc + length(w)) AS BIGINT) AS total_len,
          array_join(zip_with(slice(ws, 1, 3), slice(ws, 2, 3), (a, b) -> concat(a, '>', b)), '|') AS bigrams
        FROM (SELECT doc_id, split(text, ' ') AS ws FROM documents WHERE doc_id < 100) d
        ORDER BY doc_id""")
    }),

    "fn_conditional" -> ((s, dir) => {
      t(s, dir, "customer").filter(col("c_custkey") < 500)
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("band"),
          nullif(col("c_nationkey"), lit(7)).as("nk_n7"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          isnull(nullif(col("c_nationkey"), lit(7))).as("is7"),
          nvl2(nullif(col("c_nationkey"), lit(7)), lit("keep"), lit("was7")).as("nv2"))
        .orderBy(col("c_custkey"))
    }),

    "fn_cast_try" -> ((s, dir) => {
      graft.Tables.registerAll(s, dir)
      s.sql("""
        SELECT doc_id,
          try_cast(substr(text, 1, 2) AS INT) AS bad_int,
          cast(n_chars AS STRING) AS n_str,
          try_cast(concat('20', cast(doc_id % 30 + 10 AS STRING), '-01-15') AS DATE) AS d,
          try_divide(n_chars, doc_id % 3) AS div3
        FROM documents WHERE doc_id < 100 ORDER BY doc_id""")
    })
  )

  def oracle: Map[String, String] = Map(
    "fn_string" -> """
      SELECT n_nationkey,
        concat_ws('-', n_name, n_regionkey) AS cw,
        substring(n_name, 2, 3) AS sub, lower(n_name) AS lo,
        lpad(n_name, 12, '.') AS lp, rpad(n_name, 12, '.') AS rp,
        translate(n_name, 'AEIOU', 'aeiou') AS tr, reverse(n_name) AS rev,
        repeat(substring(n_name, 1, 2), 3) AS rep, length(n_name) AS len,
        ascii(n_name) AS asc, split_part(n_name, 'A', 1) AS si,
        instr(n_name, 'AN') AS pos,
        starts_with(n_name, 'A') AS sw, ends_with(n_name, 'A') AS ew,
        contains(n_name, 'RA') AS ct,
        trim(lpad(n_name, 10, ' ')) AS trm
      FROM nation ORDER BY n_nationkey""",

    "fn_regexp" -> """
      SELECT p_partkey,
        regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        regexp_matches(p_type, 'BRASS|COPPER') AS is_metal,
        string_split(p_type, ' ')[1] AS t0
      FROM part WHERE p_partkey < 300 ORDER BY p_partkey""",

    "fn_levenshtein" -> """
      SELECT n1.n_name AS a, n2.n_name AS b, levenshtein(n1.n_name, n2.n_name) AS dist
      FROM nation n1 CROSS JOIN nation n2
      WHERE n1.n_name < n2.n_name AND levenshtein(n1.n_name, n2.n_name) <= 4
      ORDER BY a, b""",

    "fn_date" -> """
      SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        day(o_orderdate) AS d, quarter(o_orderdate) AS q,
        dayofweek(o_orderdate) + 1 AS dow, dayofyear(o_orderdate) AS doy,
        weekofyear(o_orderdate) AS woy,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        last_day(CAST(o_orderdate AS DATE)) AS mend,
        CAST(o_orderdate AS DATE) + 30 AS plus30,
        CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS to_end,
        CAST(epoch(o_orderdate) AS BIGINT) AS epoch
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""",

    "fn_math" -> """
      SELECT c_custkey, abs(c_acctbal) AS ab,
        CAST(ceil(c_acctbal) AS BIGINT) AS ce,
        CAST(floor(c_acctbal) AS BIGINT) AS fl, round(c_acctbal, 1) AS rd,
        CAST(sign(c_acctbal) AS INT) AS sg,
        round(sqrt(abs(c_acctbal)), 6) AS sq,
        round(pow(c_nationkey, 2), 1) AS pw,
        round(exp(c_nationkey / 10.0), 6) AS ex,
        round(ln(c_custkey + 1), 6) AS ln_,
        round(log10(c_custkey + 1), 6) AS l10,
        greatest(c_acctbal, 0.0) AS gr, least(c_nationkey, 10) AS le,
        c_custkey % 7 AS pm, c_custkey % 7 AS md,
        bit_count(c_nationkey) AS bc,
        upper(to_hex(c_custkey)) AS hx,
        c_nationkey * 4 AS shl
      FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""",

    "fn_hash_digest" -> """
      SELECT n_nationkey, md5(n_name) AS h_md5, sha256(n_name) AS h_sha256,
        to_base64(CAST(n_name AS BLOB)) AS b64,
        hex(CAST(n_name AS BLOB)) AS hx,
        CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR) AS rt
      FROM nation ORDER BY n_nationkey""",

    "fn_array" -> """
      SELECT doc_id, len(ws) AS n,
        list_contains(ws, 'data') AS has_data,
        CAST(coalesce(list_position(ws, 'data'), 0) AS INT) AS pos_data,
        array_to_string(list_filter(ws, (w, i) -> list_position(ws, w) = i), '|') AS uniq,
        array_to_string(ws[1:3], '|') AS first3,
        array_to_string(ws[1:3], '_') AS joined,
        list_max(ws) AS mx, list_min(ws) AS mn,
        array_to_string(list_sort(list_distinct(ws)), '|') AS sorted_uniq,
        ws[1] AS w1, ws[-1] AS wlast,
        array_to_string(list_reverse(ws[1:3]), '|') AS rev3,
        array_to_string(flatten([ws[1:2], ws[3:3]]), '|') AS flat3,
        array_to_string([ws[1], ws[1]], '|') AS rep2
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id < 100) d
      ORDER BY doc_id""",

    "fn_array_hof" -> """
      SELECT doc_id,
        array_to_string(list_transform(ws, w -> length(w)), '|') AS lens,
        array_to_string(list_filter(ws, w -> length(w) > 4), '|') AS longw,
        len(list_filter(ws, w -> w = 'data')) > 0 AS has_data,
        len(list_filter(ws, w -> length(w) <= 1)) = 0 AS all_long,
        CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0) AS BIGINT) AS total_len,
        array_to_string(list_transform(generate_series(1, least(3, len(ws) - 1)),
                        i -> concat(ws[i], '>', ws[i + 1])), '|') AS bigrams
      FROM (SELECT doc_id, string_split(text, ' ') AS ws
            FROM documents WHERE doc_id < 100) d
      ORDER BY doc_id""",

    "fn_conditional" -> """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0 THEN 'neg'
             WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS band,
        nullif(c_nationkey, 7) AS nk_n7,
        coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        nullif(c_nationkey, 7) IS NULL AS is7,
        CASE WHEN nullif(c_nationkey, 7) IS NOT NULL THEN 'keep' ELSE 'was7' END AS nv2
      FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""",

    "fn_cast_try" -> """
      SELECT doc_id,
        try_cast(substr(text, 1, 2) AS INT) AS bad_int,
        cast(n_chars AS VARCHAR) AS n_str,
        try_cast(concat('20', cast(doc_id % 30 + 10 AS VARCHAR), '-01-15') AS DATE) AS d,
        n_chars / nullif(doc_id % 3, 0) AS div3
      FROM documents WHERE doc_id < 100 ORDER BY doc_id"""
  )
}
