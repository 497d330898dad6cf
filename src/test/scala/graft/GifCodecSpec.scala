package graft

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps

/** GIF/LZW codec cross-validation: our encoder's bytes must decode
  * pixel-for-pixel identically through BOTH our own LZW decoder and
  * javax.imageio's independent GIF reader — the same independent-reader
  * discipline as PngCodecSpec. Sizes chosen to cross the LZW width
  * bumps (9->10->11->12 bits) and a clear-code reset. */
class GifCodecSpec extends AnyFunSuite {

  private def grayFromImageIO(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not parse our GIF")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = Array.tabulate(w * h) { i =>
      img.getRGB(i % w, i / w) & 0xff // grayscale: b == g == r
    }
    (w, h, px)
  }

  private def pattern(id: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      (((id * 7 + 3 * (i % w) + 5 * (i / w)) % 256)).toInt
    }

  test("round-trip through our decoder AND imageio, pixel-for-pixel") {
    for ((id, w, h) <- Seq((1L, 16, 8), (42L, 31, 17), (7L, 64, 80))) {
      val bytes = MultimodalOps.encodeGif(id, w, h)
      val (dw, dh, ours) = MultimodalOps.decodeGif(id, bytes)
      assert((dw, dh) == (w, h))
      assert(ours.toSeq == pattern(id, w, h).toSeq, s"our decode differs for id=$id")
      val (iw, ih, theirs) = grayFromImageIO(bytes)
      assert((iw, ih) == (w, h))
      assert(theirs.toSeq == ours.toSeq, s"imageio disagrees for id=$id")
    }
  }

  test("a stream long enough to force width bumps and a clear reset") {
    // 120x80 = 9600 px: the literal stream grows the decoder dict past
    // 512/1024/2048/4094 -> two full clear cycles
    val bytes = MultimodalOps.encodeGif(9L, 120, 80)
    val (_, _, ours) = MultimodalOps.decodeGif(9L, bytes)
    val (_, _, theirs) = grayFromImageIO(bytes)
    assert(ours.toSeq == pattern(9L, 120, 80).toSeq)
    assert(theirs.toSeq == ours.toSeq)
  }

  test("decoder survives an interposed extension block") {
    // splice a GCE extension (0x21 0xF9 ...) between the palette and
    // the image descriptor — real-world GIFs carry these
    val bytes = MultimodalOps.encodeGif(3L, 10, 10)
    val palEnd = 6 + 7 + 256 * 3
    val gce = Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0)
    val spliced = bytes.take(palEnd) ++ gce ++ bytes.drop(palEnd)
    val (w, h, px) = MultimodalOps.decodeGif(3L, spliced)
    assert((w, h) == (10, 10))
    assert(px.toSeq == pattern(3L, 10, 10).toSeq)
  }
}
