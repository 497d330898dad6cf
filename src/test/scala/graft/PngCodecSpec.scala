package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PNG encoder must produce files an INDEPENDENT decoder accepts:
  * javax.imageio ships its own PNG reader, so round-tripping through it
  * proves the chunk layout, CRCs, zlib stream, and filter bytes are
  * spec-conformant — not merely self-consistent with our own decoder.
  * Conversely our decoder must agree with ImageIO pixel-for-pixel. */
class PngCodecSpec extends AnyFunSuite {

  test("encoded PNGs are readable by ImageIO and pixel-identical") {
    for (id <- Seq(0L, 1L, 7L, 123L, 9999L)) {
      val bytes = graft.ops.MultimodalOps.encodePng(id, 16, 16)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected the PNG for id=$id")
      assert(img.getWidth == 16 && img.getHeight == 16)
      for (y <- 0 until 16; x <- 0 until 16) {
        val expected = ((id * 31 + x * 7 + y * 3) % 256).toInt
        val actual = img.getRaster.getSample(x, y, 0)
        assert(actual == expected,
          s"id=$id pixel($x,$y): ImageIO=$actual expected=$expected")
      }
    }
  }

  test("all five filter types round-trip through our decoder") {
    // 16 rows cycle row%5 => every filter type appears >= 3 times; the
    // oracle-exact mm_png_decode key covers stats, this covers exact
    // per-pixel recon via the checksum identity on a known image
    val bytes = graft.ops.MultimodalOps.encodePng(42L, 16, 16)
    val expected = (for (y <- 0 until 16; x <- 0 until 16)
      yield (42L * 31 + x * 7 + y * 3) % 256).sum
    // decode via the batch path on a tiny local frame
    val spark = TestSpark.spark
    import spark.implicits._
    val df = spark.createDataset(Seq((42L, bytes))).toDF("id", "png")
    val row = graft.ops.MultimodalOps.decodePngBatch(df, "id", "png").collect().head
    assert(row.getAs[Long]("checksum") == expected)
  }
}
