package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import Q._

/** Third extras sweep: orthogonal bitmap intersection (reference:
  * aggregate_function_orthogonal_bitmap*.cpp — "users matching ALL
  * tags"), group_array_intersect (aggregate_function_group_array_
  * intersect), and map_agg (map_from_entries over collected pairs).
  */
object Extras3Queries {

  private def sql(q: String): (SparkSession, String) => DataFrame =
    (s, dir) => { graft.Tables.registerAll(s, dir); s.sql(q) }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // customers who ordered in ALL five priorities: per-tag bitmaps
    // intersected orthogonally (one shard per tag, like Doris's
    // orthogonal_bitmap_intersect two-level plan).
    "x3_orthogonal_bitmap" -> sql("""
      WITH per_tag AS (
        SELECT o_orderpriority, bitmap_agg(o_custkey) AS bm
        FROM orders GROUP BY o_orderpriority)
      SELECT bitmap_count(bitmap_intersect_agg(bm)) AS n_all_tags,
             count(*) AS n_tags
      FROM per_tag"""),

    // words present in EVERY document of a language.
    "x3_group_array_intersect" -> sql("""
      WITH doc_words AS (
        SELECT lang, doc_id, collect_set(word) AS ws FROM (
          SELECT lang, doc_id, explode(split(text, ' ')) AS word
          FROM documents WHERE doc_id < 120) x
        GROUP BY lang, doc_id),
      counts AS (
        SELECT lang, word, count(*) AS n_docs_with
        FROM (SELECT lang, doc_id, explode(ws) AS word FROM doc_words) e
        GROUP BY lang, word),
      totals AS (SELECT lang, count(*) AS n_docs FROM doc_words GROUP BY lang)
      SELECT c.lang, array_join(array_sort(collect_list(c.word)), '|') AS common_words
      FROM counts c JOIN totals t ON c.lang = t.lang
      WHERE c.n_docs_with = t.n_docs
      GROUP BY c.lang ORDER BY c.lang"""),

    // map_agg: priority -> exact sales map per year. The map is built
    // with map_from_entries and serialized back through map_entries —
    // the driver's pandas compare cannot sort map/list cells, and
    // DECIMAL-to-string is the only rendering both engines agree on
    // (double-to-string goes scientific in Spark at >=1e7).
    "x3_map_agg" -> sql("""
      WITH a AS (
        SELECT year(o_orderdate) AS yr, o_orderpriority AS p,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS v
        FROM orders GROUP BY year(o_orderdate), o_orderpriority)
      SELECT yr,
             concat_ws('|', transform(
               map_entries(map_from_entries(array_sort(collect_list(struct(p, v))))),
               e -> concat(e.key, '=', CAST(e.value AS STRING)))) AS sales
      FROM a GROUP BY yr ORDER BY yr""")
  )

  def oracle: Map[String, String] = Map(
    "x3_orthogonal_bitmap" -> """
      SELECT (SELECT count(*) FROM (
                SELECT o_custkey FROM orders
                GROUP BY o_custkey
                HAVING count(DISTINCT o_orderpriority) =
                       (SELECT count(DISTINCT o_orderpriority) FROM orders)) q
             ) AS n_all_tags,
             (SELECT count(DISTINCT o_orderpriority) FROM orders) AS n_tags""",

    "x3_group_array_intersect" -> """
      WITH doc_words AS (
        SELECT lang, doc_id, list_distinct(string_split(text, ' ')) AS ws
        FROM documents WHERE doc_id < 120),
      counts AS (
        SELECT lang, word, count(*) AS n_docs_with
        FROM (SELECT lang, doc_id, unnest(ws) AS word FROM doc_words) e
        GROUP BY lang, word),
      totals AS (SELECT lang, count(*) AS n_docs FROM doc_words GROUP BY lang)
      SELECT c.lang, array_to_string(list_sort(list(c.word)), '|') AS common_words
      FROM counts c JOIN totals t ON c.lang = t.lang
      WHERE c.n_docs_with = t.n_docs
      GROUP BY c.lang ORDER BY c.lang""",

    "x3_map_agg" -> """
      WITH a AS (
        SELECT year(o_orderdate) AS yr, o_orderpriority AS p,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS v
        FROM orders GROUP BY year(o_orderdate), o_orderpriority)
      SELECT yr, string_agg(p || '=' || CAST(v AS VARCHAR), '|' ORDER BY p) AS sales
      FROM a GROUP BY yr ORDER BY yr"""
  )
}
