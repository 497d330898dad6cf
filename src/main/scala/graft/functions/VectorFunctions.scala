package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Array/vector distance functions (reference:
  * be/src/exec/expr/../function/array/function_array_distance.cpp —
  * l1/l2/cosine/inner product; used by the ANN search path).
  *
  * Implemented as compositions of native higher-order functions
  * (zip_with + aggregate), so they stay inside whole-stage codegen —
  * no UDF serialization on the 100 TB scan path. Also registered as
  * SQL UDFs (Spark 4 `CREATE FUNCTION … RETURN expr`), which inline to
  * the same codegen'd expressions.
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, _.cast("double"))
  private def fsum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, v) => acc + v)

  def innerProduct(a: Column, b: Column): Column =
    fsum(zip_with(d(a), d(b), (x, y) => x * y))

  def l1Distance(a: Column, b: Column): Column =
    fsum(zip_with(d(a), d(b), (x, y) => abs(x - y)))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(fsum(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y))))

  def cosineSimilarity(a: Column, b: Column): Column =
    innerProduct(a, b) /
      (sqrt(fsum(transform(d(a), x => x * x))) *
        sqrt(fsum(transform(d(b), x => x * x))))

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** SQL-surface registration; the RETURN bodies mirror the Column
    * helpers exactly. */
  def register(spark: SparkSession): Unit = {
    def fallback(): Unit = {
      def s(xs: Seq[Double]) = xs
      spark.udf.register("inner_product",
        (a: Seq[Double], b: Seq[Double]) => s(a).zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _))
      spark.udf.register("l1_distance",
        (a: Seq[Double], b: Seq[Double]) => s(a).zip(b).map { case (x, y) => math.abs(x - y) }.foldLeft(0.0)(_ + _))
      spark.udf.register("l2_distance",
        (a: Seq[Double], b: Seq[Double]) => math.sqrt(s(a).zip(b).map { case (x, y) => (x - y) * (x - y) }.foldLeft(0.0)(_ + _)))
      spark.udf.register("cosine_distance", (a: Seq[Double], b: Seq[Double]) => {
        val ip = s(a).zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
        1.0 - ip / (math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _)) *
          math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _)))
      })
    }
    def create(name: String, body: String): Unit = spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION $name(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
          RETURNS DOUBLE RETURN $body""")
    try {
    create("inner_product",
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    create("l1_distance",
      "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    create("l2_distance",
      "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), CAST(0 AS DOUBLE), (acc, v) -> acc + v))")
    create("cosine_distance",
      """1.0 - aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
             / (sqrt(aggregate(transform(a, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v))
              * sqrt(aggregate(transform(b, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""")
    // similarity form — NOT 1-cosine_distance (that round-trips through
    // two IEEE subtractions and can differ in the last ulp)
    create("cosine_sim",
      """aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)
             / (sqrt(aggregate(transform(a, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v))
              * sqrt(aggregate(transform(b, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)))""")
    } catch {
      case _: org.apache.spark.sql.catalyst.parser.ParseException => fallback()
    }
  }
}
