package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ExternalUdf

/** Line-protocol framing guard (ExternalUdf.tsvSafe): a value carrying
  * tab/newline must fail the task loudly — silent frame corruption was
  * the r7-advice failure mode — while clean values stream through the
  * external process unchanged. */
class TsvFrameSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("clean values round-trip through an external cat process") {
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "v")
    val out = ExternalUdf.pipeTransform(df, "id", "v", Seq("cat"), "v2")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "alpha"), (2L, "beta")))
  }

  test("a tab inside the value fails loudly, not as a corrupted frame") {
    val df = Seq((1L, "ok"), (2L, "bad\tvalue")).toDF("id", "v")
    val e = intercept[Exception] {
      ExternalUdf.pipeTransform(df, "id", "v", Seq("cat"), "v2").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("tab/newline")),
      s"expected the framing guard, got: ${messages(e).mkString(" | ")}")
  }
}
