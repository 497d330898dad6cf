package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Central registry of graft's custom functions (reference FE:
  * fe/fe-core/.../catalog/BuiltinScalarFunctions.java:601+ and
  * BuiltinAggregateFunctions.java — re-expressed as Catalyst
  * extensions + session-registered UDAFs/SQL UDFs).
  */
object FunctionRegistry {

  /** Expression-backed functions injected via extensions. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq.empty

  def registerExtensions(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }

  /** Session-scoped registrations (UDAFs + SQL UDFs need a live
    * session). Idempotent. */
  def registerAll(spark: SparkSession): Unit = {
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "graft")
    }
    Bitmaps.register(spark)
    BehaviorAggs.register(spark)
    VectorFunctions.register(spark)
    MiscFunctions.register(spark)
    AiFunctions.register(spark)
    MoreAggs.register(spark)
  }
}
