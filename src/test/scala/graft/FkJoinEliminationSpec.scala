package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Constraints

/** Soundness of PK-FK / unique join elimination beyond the fixture
  * queries: NULL FKs must keep inner-join semantics (dropped), and
  * non-qualifying join types must not fire. */
class FkJoinEliminationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  Constraints.declareForeignKey("t_fk_col", "t_pk_col")

  private def parent = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    .toDF("t_pk_col", "p_payload")
  private def child = Seq(
    (10L, Some(1L)), (11L, Some(1L)), (12L, Some(3L)), (13L, None))
    .toDF("c_id", "t_fk_col")

  test("inner join with NULL fks: eliminated plan drops the null row like the join") {
    val joined = child.join(parent, col("t_fk_col") === col("t_pk_col"))
      .select(col("c_id"))
    val p = joined.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), s"join not eliminated:\n$p")
    // the NULL-fk row (13) must be gone, exactly as the real join drops it
    assert(joined.collect().map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L, 12L))
  }

  test("left outer to unique parent: eliminated, null fk row KEPT") {
    val joined = child.join(parent, col("t_fk_col") === col("t_pk_col"), "left")
      .select(col("c_id"))
    val p = joined.queryExecution.optimizedPlan.toString
    assert(!p.contains("Join"), s"left join not eliminated:\n$p")
    assert(joined.count() == 4)
  }

  test("right / full joins never fire") {
    for (jt <- Seq("right", "full")) {
      val joined = child.join(parent, col("t_fk_col") === col("t_pk_col"), jt)
        .select(col("c_id"))
      assert(joined.queryExecution.optimizedPlan.toString.contains("Join"),
        s"$jt join must not be eliminated")
    }
  }

  test("undeclared key pair never fires") {
    val other = Seq((1L, "x")).toDF("unrelated_key", "y")
    val joined = child.join(other, col("t_fk_col") === col("unrelated_key"))
      .select(col("c_id"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
  }

  test("parent payload consumed above: never fires") {
    val joined = child.join(parent, col("t_fk_col") === col("t_pk_col"))
      .select(col("c_id"), col("p_payload"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
  }
}
