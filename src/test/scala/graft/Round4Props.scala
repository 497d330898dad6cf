package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.{MapAggs, SmCrypto}

/** Round-4 algebraic laws: the new map-valued aggregates must be
  * partition-invariant (merge associative + commutative with reduce
  * order free), the weighted percentile must equal the percentile of
  * the physically expanded multiset, and SM4 must roundtrip for every
  * input under every 16-byte key.
  */
object MapAggProps extends Properties("MapAggs") {

  private val kv: Gen[Map[String, Double]] =
    Gen.mapOf(Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(-100.0, 100.0)))
  private val rows = Gen.listOf(kv)

  private def runSplit(xs: List[Map[String, Double]], split: Int,
                       agg: MapAggs.MapFoldAgg): Map[String, Double] = {
    val (l, r) = xs.splitAt(split)
    agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
  }

  property("sum_map partition invariance") = forAll(rows, Gen.chooseNum(0, 20)) { (xs, k) =>
    val agg = new MapAggs.MapFoldAgg(_ + _)
    val whole = xs.foldLeft(agg.zero)(agg.reduce)
    val split = runSplit(xs, math.min(k, xs.length), agg)
    whole.keySet == split.keySet &&
      whole.forall { case (key, v) => math.abs(split(key) - v) < 1e-9 }
  }

  property("min_map = per-key minimum") = forAll(rows) { xs =>
    val agg = new MapAggs.MapFoldAgg(math.min)
    val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    val want = xs.flatten.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
    got == want
  }

  property("weighted percentile = expanded percentile") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0.0, 50.0), Gen.chooseNum(1L, 5L))),
           Gen.chooseNum(0.0, 1.0)) { (vw, p) =>
      val agg = new MapAggs.PercentileWeightedAgg(p)
      val got = agg.finish(vw.map { case (v, w) => MapAggs.WVal(v, w) }).get
      // physical expansion + exact interpolated percentile
      val expanded = vw.flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.sorted
      val idx = p * (expanded.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      val want = expanded(lo) + (idx - lo) * (expanded(hi) - expanded(lo))
      math.abs(got - want) < 1e-9
    }

  property("group_array_intersect = fold of set intersection") =
    forAll(Gen.listOf(Gen.listOf(Gen.chooseNum(0L, 8L)))) { arrays =>
      val agg = new MapAggs.GroupArrayIntersectAgg
      val got = agg.finish(arrays.foldLeft(agg.zero)(agg.reduce))
      val want = arrays.map(_.toSet) match {
        case Nil => Nil
        case sets => sets.reduce(_ intersect _).toSeq.sorted
      }
      got == want
    }
}

/** Path-walker laws: mutation and extraction must agree, removal must
  * erase, key-sorting must be idempotent and value-preserving. */
object JsonWalkerProps extends Properties("JsonWalker") {
  import graft.functions.JsonFunctions

  private val key = Gen.oneOf("a", "b", "c", "deep")
  private val scalarJson = Gen.oneOf("1", "2.5", "\"s\"", "true", "null", "[1,2]")
  private val doc: Gen[String] = for {
    ks <- Gen.nonEmptyListOf(Gen.zip(key, scalarJson))
  } yield ks.distinctBy(_._1)
    .map { case (k, v) => "\"" + k + "\":" + v }
    .mkString("{", ",", "}")

  property("set then extract returns the value") = forAll(doc, key, scalarJson) { (d, k, v) =>
    val set = JsonFunctions.mutate(d, "$." + k, v, 0)
    JsonFunctions.resolve(set, "$." + k).map(_.toString).contains(v.replace(" ", ""))
  }

  property("insert never overwrites") = forAll(doc, key, scalarJson) { (d, k, v) =>
    val before = JsonFunctions.resolve(d, "$." + k).map(_.toString)
    val ins = JsonFunctions.mutate(d, "$." + k, v, 1)
    val after = JsonFunctions.resolve(ins, "$." + k).map(_.toString)
    if (before.isDefined) after == before else after.contains(v.replace(" ", ""))
  }

  property("remove erases the path") = forAll(doc, key) { (d, k) =>
    JsonFunctions.resolve(JsonFunctions.remove(d, "$." + k), "$." + k).isEmpty
  }

  property("sortKeys is idempotent and value-preserving") = forAll(doc, key) { (d, k) =>
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val once = m.writeValueAsString(JsonFunctions.sortKeys(m.readTree(d)))
    val twice = m.writeValueAsString(JsonFunctions.sortKeys(m.readTree(once)))
    once == twice &&
      JsonFunctions.resolve(once, "$." + k).map(_.toString) ==
        JsonFunctions.resolve(d, "$." + k).map(_.toString)
  }
}

object SmCryptoProps extends Properties("SmCrypto") {

  private val text = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
  private val key16 = Gen.listOfN(16, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)

  property("sm4 ECB+PKCS7 roundtrip") = forAll(text, key16) { (s, k) =>
    val plain = s.getBytes("UTF-8")
    val back = SmCrypto.sm4DecryptEcb(SmCrypto.sm4EncryptEcb(plain, k), k)
    back != null && back.sameElements(plain)
  }

  property("sm4 ciphertext length = padded block multiple") = forAll(text, key16) { (s, k) =>
    val n = s.getBytes("UTF-8").length
    SmCrypto.sm4EncryptEcb(s.getBytes("UTF-8"), k).length == (n / 16 + 1) * 16
  }

  property("sm3 is 32 bytes and input-sensitive") = forAll(text, text) { (a, b) =>
    val ha = SmCrypto.sm3(a.getBytes("UTF-8"))
    val hb = SmCrypto.sm3(b.getBytes("UTF-8"))
    ha.length == 32 && ((a == b) == ha.sameElements(hb))
  }
}
