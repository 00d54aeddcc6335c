package graft.multimodal

import graft.SparkTestBase

/** The real-resize chain: fixture pixel identity (decoded sample ==
  * id-arithmetic), nearest-neighbor resample exactness, round-trip PNG
  * losslessness, and the audit path for undecodable payloads. */
class MediaResizeSpec extends SparkTestBase {
  import spark.implicits._

  private def expectedPixel(id: Long, x: Int, y: Int): Long =
    (x * 7 + y * 13 + id) % 255

  test("fixture PNGs decode to the id-arithmetic pixel values (both colorspaces)") {
    for (id <- Seq(6L, 9L)) { // even = gray, odd = RGB
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(MediaFixtures.pngPayload(id)))
      val r = img.getRaster
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(r.getSample(x, y, 0) == expectedPixel(id, x, y),
          s"id=$id ($x,$y): ${r.getSample(x, y, 0)}")
    }
  }

  test("resizeImages: NN resample + PNG round trip measure exactly") {
    val ids = Seq(6L, 9L, 12L, 33L)
    val assets = ids.toDF("id").as[Long]
      .map(id => MediaPipeline.MediaAsset(id, "image",
        MediaFixtures.pngPayload(id), Map.empty))
    val got = MediaPipeline.resizeImages(assets, 6, 5).collect()
      .map(r => r.asset_id -> r).toMap
    ids.foreach { id =>
      val r = got(id)
      assert(r.ok, r.err)
      assert(r.out_w.contains(6) && r.out_h.contains(5))
      val sw = MediaFixtures.imageWidth(id)
      val sh = MediaFixtures.imageHeight(id)
      val expected = (for (y <- 0 until 5; x <- 0 until 6)
        yield expectedPixel(id, x * sw / 6, y * sh / 5)).sum
      assert(r.pixel_sum.contains(expected),
        s"id=$id sum ${r.pixel_sum} != $expected")
      // the emitted payload really is a PNG of the target size
      val rt = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(rt.getWidth == 6 && rt.getHeight == 5)
    }
  }

  test("resizeImages audits undecodable payloads instead of failing the task") {
    val assets = Seq(
      MediaPipeline.MediaAsset(1L, "image", MediaFixtures.pngPayload(1L), Map.empty),
      MediaPipeline.MediaAsset(2L, "image", Array[Byte](1, 2, 3), Map.empty))
      .toDS()
    val got = MediaPipeline.resizeImages(assets, 4, 4).collect()
      .map(r => r.asset_id -> r.ok).toMap
    assert(got == Map(1L -> true, 2L -> false))
  }
}
