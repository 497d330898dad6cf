package graft

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.JpegCodec

/** Baseline-JPEG codec cross-validation: our encoder's bytes must
  * decode pixel-for-pixel identically through BOTH our own decoder and
  * javax.imageio's independent (libjpeg-lineage) reader. The fixtures
  * are block-constant (DC-only, q_dc = 8), the exactly-decodable
  * subset, so "identical" means bit-exact — any conformant IDCT
  * reconstructs a DC-only block exactly. */
class JpegCodecSpec extends AnyFunSuite {

  private def grayFromImageIO(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not parse our JPEG")
    val (w, h) = (img.getWidth, img.getHeight)
    // raw raster samples: getRGB would run the gray->sRGB gamma
    // conversion (7 becomes 46) and mask the comparison
    val px = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, px)
  }

  private def pattern(id: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      JpegCodec.blockValue(id, (i % w) / 8, (i / w) / 8)
    }

  test("zigzag walk matches the published order prefix") {
    assert(JpegCodec.Zigzag.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(JpegCodec.Zigzag.toSet == (0 until 64).toSet)
  }

  test("round-trip through our decoder AND imageio, pixel-for-pixel") {
    for ((id, w, h) <- Seq((1L, 16, 16), (42L, 64, 32), (977L, 80, 56))) {
      val bytes = JpegCodec.encodeJpeg(id, w, h)
      val (dw, dh, ours) = JpegCodec.decodeJpeg(id, bytes)
      assert((dw, dh) == (w, h))
      assert(ours.toSeq == pattern(id, w, h).toSeq, s"our decode differs for id=$id")
      val (iw, ih, theirs) = grayFromImageIO(bytes)
      assert((iw, ih) == (w, h))
      assert(theirs.toSeq == ours.toSeq, s"imageio disagrees for id=$id")
    }
  }

  test("DC prediction crosses many blocks and both diff signs") {
    // 96x96 = 144 blocks; block values wrap mod 256 so diffs go both
    // ways and hit large categories
    val bytes = JpegCodec.encodeJpeg(201L, 96, 96)
    val (_, _, ours) = JpegCodec.decodeJpeg(201L, bytes)
    assert(ours.toSeq == pattern(201L, 96, 96).toSeq)
    val (_, _, theirs) = grayFromImageIO(bytes)
    assert(theirs.toSeq == ours.toSeq)
  }
}
