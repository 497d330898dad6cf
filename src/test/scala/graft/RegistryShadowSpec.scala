package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Registry-shadowing audit (round-6 verdict item 8): the graft session
  * registers ~1055 names; none may silently shadow a Spark builtin with
  * different semantics. This spec extracts every registered name from
  * the function-module sources and intersects it with Spark's static
  * builtin registry. The intersection must be EXACTLY the reviewed
  * exclusion list below — a new overlap fails here until it is either
  * renamed or reviewed as an intentional, documented override.
  */
class RegistryShadowSpec extends AnyFunSuite {

  /** Reviewed intentional overrides (each drops the builtin first so
    * the replacement is deliberate, and documents the semantic diff at
    * the registration site):
    *  - bitmap_count: Spark 4 counts set bits of a fixed 4KB bitmap
    *    blob; Doris semantics = cardinality of a roaring bitmap
    *    (BitmapFunctions.scala — drop-first override).
    *  - st_asbinary / st_geomfromwkb: Spark 4.1 builtins are
    *    GEOMETRY-typed; this engine's geometry model is WKT strings
    *    matching the reference's st_* surface (GeoFunctions.scala —
    *    drop-first override).
    */
  private val reviewedOverrides =
    Set("bitmap_count", "st_asbinary", "st_geomfromwkb")

  private def registeredNamesFromSource: Set[String] = {
    val dir = Paths.get("src/main/scala/graft/functions")
    assert(Files.isDirectory(dir), s"expected $dir under the repo root")
    val files = Files.walk(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    val regPat = """(?:register|udaf)\("([A-Za-z0-9_]+)"""".r
    val builderPat = """"([a-z0-9_]+)" -> \(""".r
    files.flatMap { f =>
      val src = Files.readString(f)
      regPat.findAllMatchIn(src).map(_.group(1)) ++
        builderPat.findAllMatchIn(src).map(_.group(1))
    }.map(_.toLowerCase).toSet
  }

  test("graft names shadow exactly the reviewed Spark builtins") {
    val builtins = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.listFunction().map(_.funcName.toLowerCase).toSet
    val graftNames = registeredNamesFromSource
    assert(graftNames.size > 200,
      s"source scan looks broken: only ${graftNames.size} names found")
    val overlap = graftNames.intersect(builtins)
    assert(overlap == reviewedOverrides,
      s"unreviewed builtin shadowing: +${(overlap -- reviewedOverrides).toSeq.sorted}" +
        s" missing=${(reviewedOverrides -- overlap).toSeq.sorted}. Either rename the" +
        " function or review+document the override and add it to reviewedOverrides.")
  }

  test("reviewed overrides actually replace the builtin in a graft session") {
    import TestSpark._
    GraftSession.install(spark)
    // bitmap_count on a roaring singleton must be cardinality 1 (Doris
    // semantics), not the popcount of the serialized blob's bytes.
    val r = spark.sql("SELECT bitmap_count(to_bitmap(42L)) AS c").head()
    assert(r.getLong(0) == 1L)
    // st_asbinary must accept a WKT string (the builtin takes GEOMETRY
    // and would reject a bare string with a type error).
    val wkb = spark.sql("SELECT st_asbinary('POINT (1 2)') AS b").head()
      .getAs[Array[Byte]](0)
    assert(wkb != null && wkb.length == 21)
    // and st_geomfromwkb round-trips it back to WKT.
    val df = spark.sql("SELECT st_asbinary('POINT (1 2)') AS b")
    val back = df.selectExpr("st_geomfromwkb(b) AS w").head().getString(0)
    assert(back.contains("POINT"))
  }
}
