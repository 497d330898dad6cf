package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

import graft.functions.{CellTopK, PqCodes}

/** Property coverage for the CellTop / PqCodes kernels beyond the
  * fixture: random vectors and centroid sets (including exact-tie
  * duplicates) against straight Scala reference implementations of
  * the same arithmetic. Eval-level (no Spark session needed): the
  * kernels' `compute` is exactly what both the interpreted and
  * generated paths call. */
object CellTopProps extends Properties("CellTopKernels") {

  private val dim = 6
  private val vec: Gen[Seq[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-4.0, 4.0)).map(_.map(x => math.rint(x * 8) / 8))
  // duplicated vectors are likely (coarse 1/8 grid) so tie-breaks fire
  private val cents: Gen[Seq[(Int, Seq[Double])]] =
    Gen.chooseNum(1, 7).flatMap(k => Gen.listOfN(k, vec))
      .map(_.zipWithIndex.map { case (v, i) => (i * 3 + 1, v) })

  private def centsType = ArrayType(StructType(Seq(
    StructField("cid", IntegerType, nullable = false),
    StructField("cv", ArrayType(DoubleType, containsNull = false), nullable = false))),
    containsNull = false)

  private def centsLit(cs: Seq[(Int, Seq[Double])]) =
    Literal.create(cs.map { case (c, v) => Row(c, v) }, centsType)

  private def vecLit(v: Seq[Double]) =
    Literal.create(v, ArrayType(DoubleType, containsNull = false))

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }

  private def refTop(v: Seq[Double], cs: Seq[(Int, Seq[Double])],
                     n: Int, metric: String): Seq[(Int, Double)] = {
    val scored = cs.map { case (cid, cv) =>
      val d = metric match {
        case "l2sq" => dot(v, v) - 2 * dot(v, cv) + dot(cv, cv)
        case "cos" => dot(v, cv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv)))
        case _ => java.math.BigDecimal
          .valueOf(dot(v, cv) / (math.sqrt(dot(v, v)) * math.sqrt(dot(cv, cv))))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      }
      (cid, d)
    }
    val asc = metric == "l2sq"
    scored.sortWith { case ((c1, d1), (c2, d2)) =>
      val c = java.lang.Double.compare(d1, d2)
      if (c != 0) { if (asc) c < 0 else c > 0 } else c1 < c2
    }.take(n)
  }

  private def runKernel(v: Seq[Double], cs: Seq[(Int, Seq[Double])],
                        n: Int, metric: String): Seq[(Int, Double)] = {
    val k = CellTopK(vecLit(v), centsLit(cs), n, metric)
    val out = k.eval(null).asInstanceOf[ArrayData]
    (0 until out.numElements()).map { i =>
      val r = out.getStruct(i, 2)
      (r.getInt(0), r.getDouble(1))
    }
  }

  for (metric <- Seq("l2sq", "cos", "cos6")) {
    property(s"top-n == reference selection ($metric)") =
      forAll(vec, cents, Gen.chooseNum(1, 9)) { (v, cs, n) =>
        // cosine needs a nonzero vector (fixture contract); skip zeros
        val vv = if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v
        val csNz = cs.map { case (c, w) =>
          (c, if (w.forall(_ == 0.0)) w.updated(0, 1.0) else w) }
        runKernel(vv, csNz, n, metric) == refTop(vv, csNz, n, metric)
      }
  }

  property("pq codes == per-sub reference argmin") = forAll(
    Gen.listOfN(2, Gen.listOfN(3, vec.map(_.take(3)))), vec)
  { (books0, v0) =>
    val v = v0 // dim 6 = 2 subs x 3
    val books = books0.map(_.zipWithIndex.map { case (cv, i) => (i, cv) })
    val bt = ArrayType(centsType, containsNull = false)
    val lit = Literal.create(
      books.map(_.map { case (c, cv) => Row(c, cv) }), bt)
    val out = PqCodes(vecLit(v), lit).eval(null).asInstanceOf[ArrayData].toIntArray()
    val want = books.zipWithIndex.map { case (book, sub) =>
      val sv = v.slice(sub * 3, sub * 3 + 3)
      book.map { case (code, cv) =>
        (code, dot(sv, sv) - 2 * dot(sv, cv) + dot(cv, cv)) }
        .sortWith { case ((c1, d1), (c2, d2)) =>
          val c = java.lang.Double.compare(d1, d2)
          if (c != 0) c < 0 else c1 < c2
        }.head._1
    }
    out.toSeq == want
  }
}
