package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.LessThanOrEqual
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopN-over-ranking-window rewrite (plans/TopNWindow.scala): fires
  * only for a single ascending sort on the plan's single rank-like
  * window output, engages native WindowGroupLimit, never changes
  * values. */
class TopNWindowSpec extends AnyFunSuite {
  import TestSpark._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.topnWindow.enabled", "true")
    try f finally spark.conf.set("spark.graft.topnWindow.enabled", "false")
  }

  private def fired(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case Filter(LessThanOrEqual(_, _), _: LWindow) => true
      case _ => false
    }

  private def cust = Tables.load(spark, sf, "customer")
  private val spec = Window.partitionBy(col("c_mktsegment"))
    .orderBy(col("c_acctbal").desc, col("c_custkey"))

  // k = 5 segments x 2: the selected set is exactly the rn <= 2 rows,
  // deterministic regardless of cross-partition tie order
  private def q(rankCol: org.apache.spark.sql.Column) =
    cust.select(col("c_custkey"), col("c_mktsegment"), rankCol.as("rn"))
      .orderBy(col("rn")).limit(10)

  test("row_number fires, WindowGroupLimit engages, values identical") {
    def df = q(row_number().over(spec))
    val plain = df.collect().toSet
    val rows = withRule {
      assert(fired(df), s"did not fire:\n${df.queryExecution.optimizedPlan}")
      assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
      df.collect().toSet
    }
    assert(rows == plain)
  }

  test("rank and dense_rank fire and agree") {
    Seq(rank().over(spec), dense_rank().over(spec)).foreach { rc =>
      def df = q(rc)
      val plain = df.collect().toSet
      val rows = withRule { assert(fired(df)); df.collect().toSet }
      assert(rows == plain)
    }
  }

  test("no fire: descending sort wants the LARGEST ranks") {
    def df = cust.select(col("c_custkey"), row_number().over(spec).as("rn"))
      .orderBy(col("rn").desc).limit(10)
    withRule { assert(!fired(df)) }
  }

  test("no fire: aggregate window function does not bound row position") {
    def df = cust.select(col("c_custkey"),
        sum(col("c_acctbal")).over(spec).as("s"))
      .orderBy(col("s")).limit(10)
    withRule { assert(!fired(df)) }
  }

  test("no fire: second sort key (reference single-key guard)") {
    def df = cust.select(col("c_custkey"), row_number().over(spec).as("rn"))
      .orderBy(col("rn"), col("c_custkey")).limit(10)
    withRule { assert(!fired(df)) }
  }

  test("limit larger than every partition keeps all rows correct") {
    // filter rn <= 100000 keeps everything; values must match exactly
    def df = cust.select(col("c_custkey"), row_number().over(spec).as("rn"))
      .orderBy(col("rn")).limit(100000)
    val plain = df.collect().toSet
    val rows = withRule { df.collect().toSet }
    assert(rows == plain)
  }
}
