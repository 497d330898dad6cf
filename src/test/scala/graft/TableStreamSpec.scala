package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TableStream

/** Min-delta folding contracts, mirrored from the reference suite
  * regression-test/suites/table_stream_p0/ —
  * test_mow_min_delta_delete_before.groovy (UPDATE+DELETE folds to one
  * DELETE carrying the pre-window image; DELETE+INSERT+DELETE folds to
  * one DELETE carrying the original value) and
  * test_min_delta_stream.groovy (UPDATE_BEFORE/UPDATE_AFTER pairing),
  * test_olap_table_stream_reset.groovy (reset skips history). */
class TableStreamSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private var n = 0
  private def freshRoot(): String = {
    n += 1
    val p = s"target/stream/tsspec_$n"
    val f = new java.io.File(p)
    if (f.exists()) { import scala.reflect.io.Directory; new Directory(f).deleteRecursively() }
    p
  }

  private def rows(tuples: (Long, Int, Long, Int)*) =
    tuples.toDF("id", "v1", "seq", "del")

  private def readAll(name: String): Seq[(Long, Int, String)] =
    TableStream.read(spark, name)
      .select(col("id"), col("v1"), col(TableStream.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted

  test("UPDATE then DELETE folds to one DELETE with the pre-window value") {
    val root = freshRoot()
    TableStream.commit(rows((1L, 10, 1L, 0)), root, 1L)
    TableStream.create(spark, "ts_upd_del", root, Seq("id"), "seq", "del")
    TableStream.commit(rows((1L, 11, 2L, 0)), root, 2L) // UPDATE inside window
    TableStream.commit(rows((1L, 11, 3L, 1)), root, 3L) // then DELETE
    assert(readAll("ts_upd_del") == Seq((1L, 10, "DELETE")))
  }

  test("DELETE, re-INSERT, DELETE folds to one DELETE with the original value") {
    val root = freshRoot()
    TableStream.commit(rows((2L, 20, 1L, 0)), root, 1L)
    TableStream.create(spark, "ts_did", root, Seq("id"), "seq", "del")
    TableStream.commit(rows((2L, 20, 2L, 1)), root, 2L) // DELETE
    TableStream.commit(rows((2L, 21, 3L, 0)), root, 3L) // re-INSERT
    TableStream.commit(rows((2L, 21, 4L, 1)), root, 4L) // DELETE again
    assert(readAll("ts_did") == Seq((2L, 20, "DELETE")))
  }

  test("net UPDATE emits the BEFORE/AFTER image pair; net APPEND one row") {
    val root = freshRoot()
    TableStream.commit(rows((3L, 30, 1L, 0)), root, 1L)
    TableStream.create(spark, "ts_upd", root, Seq("id"), "seq", "del")
    TableStream.commit(rows((3L, 31, 2L, 0), (4L, 40, 3L, 0)), root, 2L)
    assert(readAll("ts_upd") == Seq(
      (3L, 30, "UPDATE_BEFORE"), (3L, 31, "UPDATE_AFTER"), (4L, 40, "APPEND")))
  }

  test("identical re-insert folds to nothing; read advances the offset") {
    val root = freshRoot()
    TableStream.commit(rows((5L, 50, 1L, 0)), root, 1L)
    TableStream.create(spark, "ts_noop", root, Seq("id"), "seq", "del")
    TableStream.commit(rows((5L, 50, 2L, 0)), root, 2L) // same payload
    assert(readAll("ts_noop").isEmpty)
    TableStream.commit(rows((5L, 51, 3L, 0)), root, 3L)
    assert(readAll("ts_noop") == Seq(
      (5L, 50, "UPDATE_BEFORE"), (5L, 51, "UPDATE_AFTER")))
    assert(readAll("ts_noop").isEmpty) // consumed
  }

  test("RESET skips history; SNAPSHOT returns the merged current state") {
    val root = freshRoot()
    TableStream.commit(rows((6L, 60, 1L, 0), (7L, 70, 2L, 0)), root, 1L)
    TableStream.create(spark, "ts_reset", root, Seq("id"), "seq", "del",
      showInitialRows = true)
    TableStream.commit(rows((6L, 61, 3L, 0), (7L, 70, 4L, 1)), root, 2L)
    TableStream.reset(spark, "ts_reset")
    assert(readAll("ts_reset").isEmpty)
    val snap = TableStream.readSnapshot(spark, "ts_reset")
      .select(col("id"), col("v1"), col(TableStream.ChangeTypeCol))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(snap == Seq((6L, 61, "APPEND"))) // 7 deleted, 6 updated
  }
}
