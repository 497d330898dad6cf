package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Table-function / LATERAL VIEW battery (SURVEY.md §2.10; reference:
  * be/src/exprs/table_function/vexplode*.cpp executed by
  * table_function_operator.h:99; FE generators under
  * nereids/trees/expressions/functions/generator/).
  */
object GeneratorQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // explode(split) — Doris explode_split; word histogram over documents.
    "gen_explode_split" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(100)
    }),

    // posexplode — position-aware expansion.
    "gen_posexplode" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .filter(col("pos") < 5)
        .orderBy(col("doc_id"), col("pos"))
    }),

    // explode_outer — rows with empty arrays survive with NULL.
    "gen_explode_outer" -> ((s, dir) => {
      t(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id"),
          when(col("n_chars") < 40, array().cast("array<string>"))
            .otherwise(split(col("text"), " ")).as("words"))
        .select(col("doc_id"), explode_outer(col("words")).as("word"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_rows"), count(col("word")).as("n_words"))
        .orderBy(col("doc_id"))
    }),

    // sequence + explode — Doris explode_numbers / numbers() TVF
    // (reference: vexplode_numbers.cpp, BuiltinTableValuedFunctions.java).
    "gen_sequence" -> ((s, dir) => {
      t(s, dir, "nation")
        .select(col("n_nationkey"),
          explode(sequence(lit(1), col("n_nationkey") % 5 + 1)).as("i"))
        .groupBy(col("n_nationkey")).agg(sum(col("i")).as("tri"))
        .orderBy(col("n_nationkey"))
    }),

    // JSON extraction — Doris json_extract / explode_json_object family
    // (reference: be/src/exprs/function/function_json.cpp, vjson_each.cpp).
    "gen_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("event_type"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    })
  )

  def oracle: Map[String, String] = Map(
    "gen_explode_split" -> """
      SELECT word, count(*) AS n FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
      WHERE len(word) > 0
      GROUP BY word ORDER BY n DESC, word LIMIT 100""",

    "gen_posexplode" -> """
      SELECT doc_id, i - 1 AS pos, w AS word FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents WHERE doc_id < 50) u
      WHERE i <= 5 ORDER BY doc_id, pos""",

    "gen_explode_outer" -> """
      SELECT doc_id, count(*) AS n_rows, count(word) AS n_words FROM (
        SELECT doc_id,
               unnest(CASE WHEN n_chars < 40 THEN [NULL]
                           ELSE string_split(text, ' ') END) AS word
        FROM documents WHERE doc_id < 100) u
      GROUP BY doc_id ORDER BY doc_id""",

    "gen_sequence" -> """
      SELECT n_nationkey, CAST(sum(i) AS BIGINT) AS tri FROM (
        SELECT n_nationkey,
               unnest(generate_series(1, n_nationkey % 5 + 1)) AS i
        FROM nation) u
      GROUP BY n_nationkey ORDER BY n_nationkey""",

    "gen_json_extract" -> """
      SELECT event_type, CAST(sum(k) AS BIGINT) AS sum_k, count(*) AS n,
             min(k) AS min_k, max(k) AS max_k FROM (
        SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, event_type
        FROM events) e
      GROUP BY event_type ORDER BY event_type"""
  )
}
