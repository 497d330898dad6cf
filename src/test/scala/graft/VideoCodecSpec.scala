package graft

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{JpegCodec, VideoCodec}

/** Video container cross-validation.
  *
  * AVI: the RIFF walk and the idx1 index must agree; every extracted
  * 00dc payload must decode identically through our JPEG decoder AND
  * javax.imageio's independent reader (raster samples — getRGB applies
  * gray->sRGB gamma and would mask real errors). Y4M: the parse is
  * validated against the closed-form luma law plus header/frame-marker
  * variants a real mjpegtools stream can carry.
  */
class VideoCodecSpec extends AnyFunSuite {

  private def imageioGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "imageio could not parse the extracted JPEG")
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    (w, h, Array.tabulate(w * h)(i => r.getSample(i % w, i / w, 0)))
  }

  test("AVI: idx1 agrees with the movi walk; frames decode through our JPEG decoder and imageio identically") {
    for (id <- Seq(0L, 5L, 23L)) {
      val bytes = VideoCodec.encodeAvi(id, 3, 64, 32)
      val info = VideoCodec.parseAvi(bytes)
      assert((info.w, info.h, info.nFrames) == (64, 32, 3))
      assert(info.walk == info.index, "index disagrees with sequential walk")
      info.walk.zipWithIndex.foreach { case ((off, len), f) =>
        val jpeg = java.util.Arrays.copyOfRange(bytes, off, off + len)
        val (w, h, ours) = JpegCodec.decodeJpeg(id, jpeg)
        assert((w, h) == (64, 32))
        val expected = Array.tabulate(w * h) { i =>
          JpegCodec.blockValue(id + f * 17L, (i % w) / 8, (i / w) / 8)
        }
        assert(ours.toSeq == expected.toSeq, s"our decode off for id=$id frame=$f")
        val (iw, ih, theirs) = imageioGray(jpeg)
        assert((iw, ih) == (w, h))
        assert(theirs.toSeq == ours.toSeq, s"imageio disagrees for id=$id frame=$f")
      }
    }
  }

  test("AVI: odd-length frame payloads are word-padded without corrupting later offsets") {
    // find an id whose first frame JPEG has odd length, so frame 1's
    // chunk must start past a pad byte
    val id = (0L to 50L).find(i => JpegCodec.encodeJpeg(i, 64, 32).length % 2 == 1)
      .getOrElse(fail("no odd-length JPEG among the probe ids"))
    val bytes = VideoCodec.encodeAvi(id, 3, 64, 32)
    val info = VideoCodec.parseAvi(bytes)
    assert(info.walk == info.index)
    val (off, len) = info.walk(1)
    val (w, h, px) = JpegCodec.decodeJpeg(id, java.util.Arrays.copyOfRange(bytes, off, off + len))
    assert((w, h) == (64, 32))
    assert(px(0) == JpegCodec.blockValue(id + 17L, 0, 0))
  }

  test("Y4M: decode matches the closed-form luma law") {
    for ((id, n, w, h) <- Seq((3L, 3, 32, 16), (11L, 1, 8, 6), (200L, 4, 12, 12))) {
      val frames = VideoCodec.decodeY4m(id, VideoCodec.encodeY4m(id, n, w, h))
      assert(frames.size == n)
      frames.foreach { case (f, dw, dh, nPx, sum, chk) =>
        assert((dw, dh, nPx) == (w, h, w.toLong * h))
        var eSum = 0L; var eChk = 0L
        var i = 0
        while (i < w * h) {
          val v = VideoCodec.y4mValue(id, f, i % w, i / w).toLong
          eSum += v; eChk += (i + 1) * v
          i += 1
        }
        assert((sum, chk) == ((eSum, eChk)), s"frame $f stats off")
      }
    }
  }

  test("Y4M: reordered header tokens, X extension params, and FRAME parameters all parse") {
    val id = 9L
    val body = VideoCodec.encodeY4m(id, 2, 8, 4)
    val headerEnd = body.indexOf('\n'.toByte) + 1
    // rewrite the header with permuted tokens + an X param, and give the
    // first FRAME marker an interlace parameter (spec-legal)
    val newHeader = "YUV4MPEG2 C420jpeg F30000:1001 H4 Xcolorrange=FULL W8 Ip A1:1\n"
      .getBytes("US-ASCII")
    val afterHeader = java.util.Arrays.copyOfRange(body, headerEnd, body.length)
    val frameLen = "FRAME\n".getBytes("US-ASCII").length
    val rest = java.util.Arrays.copyOfRange(afterHeader, frameLen, afterHeader.length)
    val mutated = newHeader ++ "FRAME Ip\n".getBytes("US-ASCII") ++ rest
    val frames = VideoCodec.decodeY4m(id, mutated)
    assert(frames.size == 2)
    assert(frames.head._2 == 8 && frames.head._3 == 4)
    val expected = (0 until 32).map(i => VideoCodec.y4mValue(id, 0, i % 8, i / 8).toLong).sum
    assert(frames.head._5 == expected)
  }

  test("Y4M: bad magic and non-neutral chroma fail loudly") {
    intercept[IllegalArgumentException] {
      VideoCodec.decodeY4m(1L, "NOTY4M W8 H4\nFRAME\n".getBytes("US-ASCII"))
    }
    val good = VideoCodec.encodeY4m(1L, 1, 8, 4)
    good(good.length - 1) = 77 // corrupt the last chroma byte
    intercept[IllegalArgumentException] { VideoCodec.decodeY4m(1L, good) }
  }
}
