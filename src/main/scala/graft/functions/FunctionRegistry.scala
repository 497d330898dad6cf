package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Central registry of graft's custom functions (reference FE:
  * fe/fe-core/.../catalog/BuiltinScalarFunctions.java:601+ and
  * BuiltinAggregateFunctions.java — re-expressed as native Catalyst
  * expressions injected through SparkSessionExtensions).
  */
object FunctionRegistry {

  /** name -> builder. Populated as function families land. */
  def builders: Seq[(String, Seq[Expression] => Expression)] = Seq.empty

  def registerExtensions(e: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }

  /** Same registrations applied to a live session (tests / REPL). */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "graft")
    }
}
