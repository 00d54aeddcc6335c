package graft.multimodal

import graft.SparkTestBase
import graft.multimodal.MediaPipeline._
import org.apache.spark.sql.functions._

/** Multimodal decode: real codec round-trips, reject paths, schemas, batch
  * shape, determinism, payload pruning. */
class MediaPipelineSpec extends SparkTestBase {

  private def img(id: Long) =
    MediaAsset(id, "image", MediaFixtures.pngPayload(id), Map("origin" -> s"unit-$id"))
  private def aud(id: Long) =
    MediaAsset(id, "audio", MediaFixtures.wavPayload(id), Map("origin" -> s"unit-$id"))
  private def vid(id: Long) =
    MediaAsset(id, "video", MediaFixtures.gifPayload(id), Map("origin" -> s"unit-$id"))

  private lazy val assets = {
    import spark.implicits._
    spark.createDataset(Seq(img(1), img(2), aud(3), vid(4), img(5)))
  }

  test("image features decode real PNGs: exact dimensions, bands, determinism") {
    val f1 = imageFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = imageFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.map(_.asset_id).toSeq == Seq(1L, 2L, 5L))
    f1.foreach { f =>
      assert(f.width == MediaFixtures.imageWidth(f.asset_id))
      assert(f.height == MediaFixtures.imageHeight(f.asset_id))
      assert(f.channels == (if (MediaFixtures.imageGray(f.asset_id)) 1 else 3))
      assert(f.embedding.length == 16)
      // orthonormal-DCT bound at the 2.56e11 scale: |coef| <= ~0.80
      assert(f.embedding.forall(v => v >= -1.0f && v <= 1.0f))
    }
    // the pooled embedding is real pixel math: identical across runs
    assert(f1.zip(f2).forall { case (a, b) =>
      a.asset_id == b.asset_id && a.embedding.sameElements(b.embedding) })
    // and not degenerate (the test pattern has a gradient)
    assert(f1.exists(_.embedding.distinct.length > 1))
  }

  test("block-DCT embedding == independent reimplementation over the fixture formula") {
    // independent replay of the encoder from the fixture's pixel formula
    // (x*7 + y*13 + id) % 255: 8x8 nearest-neighbor resample, 2-D DCT-II
    // with the shared integer basis, /2.56e11 — bit-exact float32. No
    // band term: for the equal-band fixture bands cancel in the division
    // (the same rational-quotient argument the q232 oracle relies on).
    def expected(id: Long): Array[Float] = {
      val w = MediaFixtures.imageWidth(id)
      val h = MediaFixtures.imageHeight(id)
      def g(x: Int, y: Int): Long =
        ((x * w / 8) * 7 + (y * h / 8) * 13 + id) % 255
      (0 until 16).map { cell =>
        val wu = MediaPipeline.DctW(cell % 4)
        val wv = MediaPipeline.DctW(cell / 4)
        val num = (for (y <- 0 until 8; x <- 0 until 8)
          yield wu(x) * wv(y) * g(x, y)).sum
        (num.toDouble / 256000000000.0).toFloat
      }.toArray
    }
    imageFeatures(assets).collect().foreach { f =>
      assert(f.embedding.sameElements(expected(f.asset_id)),
        s"asset ${f.asset_id}: ${f.embedding.toSeq} != ${expected(f.asset_id).toSeq}")
    }
  }

  test("audio features decode real WAVs: rate, frames, exact RMS") {
    val f = audioFeatures(assets).collect()
    assert(f.map(_.asset_id).toSeq == Seq(3L))
    val a = f.head
    assert(a.sample_rate == MediaFixtures.audioRate(3))
    assert(a.n_samples == MediaFixtures.audioFrames(3).toLong)
    // constant-amplitude signal: decoded RMS is exactly amp/32768
    assert(a.rms == MediaFixtures.audioAmplitude(3) / 32768.0)
  }

  test("decodeImages quarantines corrupt payloads instead of failing") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      img(10),
      MediaAsset(11, "image", MediaFixtures.corruptPayload(11), Map.empty),
      MediaAsset(12, "image", MediaFixtures.wavPayload(12), Map.empty), // wrong codec
      img(13)))
    val out = decodeImages(mixed).collect().sortBy(_.asset_id)
    assert(out.map(_.asset_id).toSeq == Seq(10L, 11L, 12L, 13L)) // 1 row per input
    val byId = out.map(d => d.asset_id -> d).toMap
    assert(byId(10L).ok && byId(13L).ok)
    assert(byId(10L).width.contains(MediaFixtures.imageWidth(10)))
    assert(!byId(11L).ok && byId(11L).err.nonEmpty && byId(11L).width.isEmpty)
    assert(!byId(12L).ok && byId(12L).err.nonEmpty)
  }

  test("decodeAudio quarantines corrupt and truncated payloads") {
    import spark.implicits._
    val truncated = MediaFixtures.wavPayload(21).take(20) // header cut mid-way
    val mixed = spark.createDataset(Seq(
      aud(20),
      MediaAsset(21, "audio", truncated, Map.empty),
      MediaAsset(22, "audio", MediaFixtures.corruptPayload(22), Map.empty)))
    val out = decodeAudio(mixed).collect().sortBy(_.asset_id)
    assert(out.length == 3)
    val byId = out.map(d => d.asset_id -> d).toMap
    assert(byId(20L).ok && byId(20L).sample_rate.contains(MediaFixtures.audioRate(20)))
    assert(byId(20L).rms.contains(MediaFixtures.audioAmplitude(20) / 32768.0))
    assert(!byId(21L).ok && byId(21L).err.nonEmpty)
    assert(!byId(22L).ok && byId(22L).err.nonEmpty)
  }

  test("video demux decodes real GIF frames: dims, order, exact pixel sums") {
    val frames = sampleFrames(assets, stride = 1).collect().sortBy(_.frame_no)
    assert(frames.map(_.asset_id).distinct.toSeq == Seq(4L))
    // every container frame present, in order, with bit-exact constant rasters
    assert(frames.map(_.frame_no).toSeq == (0 until MediaFixtures.videoFrameCount(4)))
    frames.foreach { f =>
      assert(f.width == MediaFixtures.videoWidth(4))
      assert(f.height == MediaFixtures.videoHeight(4))
      assert(f.px_sum ==
        MediaFixtures.framePixel(4, f.frame_no).toLong * f.width * f.height)
    }
    // striding keeps exactly the 0-mod frames
    val strided = sampleFrames(assets, stride = 2).collect()
    assert(strided.map(_.frame_no).sorted.toSeq ==
      (0 until MediaFixtures.videoFrameCount(4)).filter(_ % 2 == 0))
  }

  test("decodeVideo audits container health without rasterizing frames") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      vid(30),
      MediaAsset(31, "video", MediaFixtures.corruptPayload(31), Map.empty),
      MediaAsset(32, "video", MediaFixtures.wavPayload(32), Map.empty))) // wrong container
    val out = decodeVideo(mixed).collect().sortBy(_.asset_id)
    assert(out.map(_.asset_id).toSeq == Seq(30L, 31L, 32L)) // 1 row per input
    val byId = out.map(d => d.asset_id -> d).toMap
    assert(byId(30L).ok && byId(30L).n_frames.contains(MediaFixtures.videoFrameCount(30)))
    assert(!byId(31L).ok && byId(31L).err.nonEmpty)
    assert(!byId(32L).ok && byId(32L).err.nonEmpty)
  }

  test("resize target lands in meta without touching payload") {
    val out = withResizeTarget(assets.toDF(), 224, 224)
      .select(col("asset_id"), col("meta"), length(col("payload")).as("len"))
      .collect()
    assert(out.forall(_.getAs[Map[String, String]]("meta")("resize_w") == "224"))
    val before = assets.select(length(col("payload"))).collect().map(_.getInt(0)).sorted
    assert(out.map(_.getAs[Int]("len")).sorted.sameElements(before))
  }

  test("embeddingsForJoin prunes the payload column before any shuffle") {
    val emb = embeddingsForJoin(assets)
    assert(emb.columns.toSeq == Seq("asset_id", "embedding"))
    // the physical plan must not carry `payload` into the projected output
    val plan = emb.queryExecution.executedPlan.toString()
    assert(!plan.contains("payload,") || emb.count() == 3)
  }
}
