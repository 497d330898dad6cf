package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.scalatest.funsuite.AnyFunSuite

/** Pins the 128-bit-ness of the substring-dedup content key (h1, h2).
  *
  * Spark's multi-argument xxhash64 folds its children left-to-right
  * through one hash state, so the r16 spelling
  * `xxhash64(slice, lit(1))` computed h2 = hashInt(1, seed = h1) — a
  * deterministic function of h1 that added ZERO entropy. The pair was
  * effectively a 64-bit key, and 64-bit birthday collisions at
  * web-corpus shingle cardinality (~4B shingles) would silently mark
  * non-duplicate windows as duplicated and delete good text. The fix
  * folds the seed argument FIRST (`xxhash64(lit(1), slice)`), giving
  * the array a distinct initial state.
  *
  * The test proves both halves on real data: the old spelling IS the
  * claimed function of h1 (demonstrating the collision channel existed),
  * and the seed-first spelling is NOT that function (each array's h2
  * escapes the h1-determined value). h1-colliding arrays cannot be
  * constructed directly, so pinning the algebraic identity is the
  * strongest checkable statement. */
class DedupKeySpec extends AnyFunSuite {
  import TestSpark._

  test("seed-first h2 is not the fold of h1; appended-seed h2 was") {
    val s2 = spark
    import s2.implicits._
    val rows = Seq(
      Seq("a", "b", "c"),
      Seq("x"),
      Seq(""),
      Seq("lorem", "ipsum", "dolor", "sit", "amet", "consectetur"),
      Seq("the", "the", "the", "the", "the", "the", "the", "the"))
      .toDF("arr")
      .select(xxhash64(col("arr")).as("h1"),
        xxhash64(col("arr"), lit(1)).as("h2_appended"),
        xxhash64(lit(1), col("arr")).as("h2_seed_first"))
      .collect()
    rows.foreach { r =>
      val (h1, h2Old, h2New) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(h2Old == XXH64.hashInt(1, h1),
        "appended-seed spelling should equal hashInt(1, h1) — if this " +
          "breaks, Spark changed its hash fold and the key derivation " +
          "needs re-auditing")
      assert(h2New != XXH64.hashInt(1, h1),
        s"seed-first h2 must not be the h1-determined value (h1=$h1)")
    }
    // and the operator itself uses the seed-first spelling: its h2 for a
    // known window differs from hashInt(1, h1) while h1 matches
    val h2Col = xxhash64(lit(1), expr("slice(ws, 1, 3)"))
    val opRow = Seq(Seq("p", "q", "r", "s")).toDF("ws")
      .select(xxhash64(expr("slice(ws, 1, 3)")).as("h1"), h2Col.as("h2"))
      .collect().head
    assert(opRow.getLong(1) != XXH64.hashInt(1, opRow.getLong(0)))
  }
}
