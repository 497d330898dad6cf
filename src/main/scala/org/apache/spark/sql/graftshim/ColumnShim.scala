package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** private[sql] access shim: Column <-> Expression bridging lives in
  * org.apache.spark.sql.classic.ExpressionUtils (sql-package-private in
  * Spark 4). graft's codegen kernels (CellTopK, PqCodes) take a literal
  * centroid-set child that cannot be spelled through the public
  * `expr(...)` SQL string surface without serializing the whole matrix
  * to SQL text, so they are constructed as Expressions and wrapped here.
  * No other internals touched.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
