package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.DeltaDv

/** Property coverage for the bit-level deletion-vector codecs beyond
  * the fixture vectors: arbitrary position sets must round-trip the
  * portable roaring64 serialization (crossing the array/bitmap
  * container boundary and 16/32-bit bucket edges), arbitrary 4-aligned
  * byte strings must round-trip Z85, and the full blob framing must be
  * stable. JVM-local — no Spark session. */
object DeltaDvProps extends Properties("DeltaDvCodecs") {

  // positions clustered tightly enough that single 16-bit keys
  // accumulate >4096 values (bitmap containers) while others stay
  // sparse (array containers), plus occasional high-bucket jumps
  private val positions: Gen[Seq[Long]] = for {
    nClusters <- Gen.chooseNum(1, 4)
    clusters <- Gen.listOfN(nClusters, for {
      base <- Gen.oneOf(Gen.chooseNum(0L, 1L << 20),
        Gen.chooseNum(1L << 32, (1L << 32) + (1L << 18)),
        Gen.chooseNum(7L << 32, (7L << 32) + 70000L))
      n <- Gen.oneOf(Gen.chooseNum(0, 50), Gen.chooseNum(4000, 6000))
      step <- Gen.chooseNum(1L, 3L)
    } yield (0 until n).map(i => base + i * step))
  } yield clusters.flatten.distinct.sorted

  property("roaring64 round trip") = forAll(positions) { ps =>
    DeltaDv.roaringDeserialize(DeltaDv.roaringSerialize(ps)) == ps
  }

  property("dv blob round trip") = forAll(positions) { ps =>
    DeltaDv.dvBlobPositions(DeltaDv.dvBlob(ps)) == ps
  }

  private val bytes4: Gen[Array[Byte]] =
    Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n * 4, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  property("z85 round trip") = forAll(bytes4) { bs =>
    DeltaDv.z85Decode(DeltaDv.z85Encode(bs)).sameElements(bs)
  }

  property("z85 output stays in the published alphabet") = forAll(bytes4) { bs =>
    val alphabet = ("0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toSet
    DeltaDv.z85Encode(bs).forall(alphabet)
  }
}
