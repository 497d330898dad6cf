package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q.t

/** Round-9 additions: disjunction-derived single-table predicates
  * reaching the parquet scan (plans/OrExtract.scala — reference:
  * nereids/rules/rewrite/ExtractSingleTableExpressionFromDisjunction
  * .java + InferInPredicateFromOr.java), plus native-coverage probes
  * for UnequalPredicateInfer / CountLiteralRewrite.
  */
object Round9Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Disjunctive-band filter where one OR leg carries a parquet-
    // untranslatable conjunct (column arithmetic): Spark's native
    // DataSourceStrategy fails the whole Or translation and the scan
    // gets PushedFilters: [] — every row group is read. The opt-in
    // OrExtract rule derives the per-column disjunction
    // (l_quantity=4 OR l_quantity=5 OR l_quantity=6), which IS
    // translatable and sinks to PushedFilters, so zonemap/dictionary
    // pruning works again. At 100 TB this is the difference between a
    // stats-pruned scan and a full fact scan on banded OR queries.
    "opt_or_extract_scan" -> ((s, dir) => {
      val df = t(s, dir, "lineitem")
        .filter(
          (col("l_quantity") === 4.0 &&
            col("l_extendedprice") * col("l_discount") > lit(50.0)) ||
          (col("l_quantity") === 5.0 && col("l_tax") > lit(0.05)) ||
          (col("l_quantity") === 6.0 && col("l_returnflag") === "R"))
        .groupBy(col("l_quantity").cast("int").as("qty"))
        .agg(count(lit(1)).as("n_rows"), sum(col("l_orderkey")).as("sum_ok"))
        .orderBy(col("qty"))
      Q.withFlag(s, "spark.graft.orExtract.enabled") {
        // the derived disjunction must reach the parquet scan
        val phys = df.queryExecution.executedPlan.toString
        require(phys.matches("(?s).*PushedFilters: \\[[^\\]]*l_quantity.*"),
          s"derived OR predicate did not reach PushedFilters:\n$phys")
        val rows = df.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
      }
    })
  )

  def oracle: Map[String, String] = Map(

    "opt_or_extract_scan" -> """
      SELECT CAST(l_quantity AS INT) AS qty, count(*) AS n_rows,
             CAST(sum(l_orderkey) AS BIGINT) AS sum_ok
      FROM lineitem
      WHERE (l_quantity = 4 AND l_extendedprice * l_discount > 50)
         OR (l_quantity = 5 AND l_tax > 0.05)
         OR (l_quantity = 6 AND l_returnflag = 'R')
      GROUP BY 1 ORDER BY 1"""
  )
}
