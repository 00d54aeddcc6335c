package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioSystem, UnsupportedAudioFileException}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed by per-partition batch operators.
  *
  * Image and audio decode are REAL: `javax.imageio.ImageIO` (PNG/JPEG/BMP/
  * GIF — whatever readers the JVM ships) and `javax.sound.sampled` (WAV/
  * AIFF/AU). Dimensions, channel counts, sample rates, frame counts, and RMS
  * all come from decoded pixels/samples, gated end-to-end against an oracle
  * that recomputes them arithmetically from [[MediaFixtures]]' synthetic
  * payloads (q54, q141, q204). Video demux is REAL too: multi-frame
  * containers (animated GIF — the format a bare JVM genuinely demuxes) go
  * through ImageIO's sequence reader, and each sampled frame's dimensions
  * and pixel sums come from the decoded raster. The 16-dim image EMBEDDING
  * is a real fixed-weight encoder too: an 8×8 block-DCT over the decoded
  * raster (pHash's front end), low-frequency coefficients out — honest
  * pixel math end to end, hash-gated cell by cell (q232).
  *
  * Corrupt payloads never kill a job: `decodeImages`/`decodeAudio` return
  * per-row ok/err results (`ImageIO.read` returning null, truncated files,
  * and `UnsupportedAudioFileException` all land in the reject path), so a
  * 100 TB scan with a 1e-6 corruption rate yields a quarantine table, not a
  * stage retry storm.
  *
  * Scale notes: payloads are the dominant bytes at 100 TB. Operators keep
  * them out of shuffles — features/metadata are projected BEFORE any wide
  * stage, and the payload column is dropped as early as possible. The
  * `mapPartitions` shape mirrors a batched UDF: amortized per-batch setup,
  * streaming iterators, no per-row JVM churn.
  */
object MediaPipeline {

  // in-memory stream cache: ImageIO otherwise spills every decode to a temp
  // file, a syscall per row on the executor hot path
  ImageIO.setUseCache(false)

  /** One media asset: payload is the opaque encoded bytes. */
  final case class MediaAsset(
      asset_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      asset_id: Long,
      width: Int,
      height: Int,
      channels: Int,
      embedding: Array[Float])

  final case class AudioFeatures(
      asset_id: Long,
      sample_rate: Int,
      n_samples: Long,
      rms: Double)

  /** One decoded video frame: dimensions and the pixel-sample sum come from
    * the REAL frame raster, so they prove the demux decoded the right frame. */
  final case class VideoFrame(
      asset_id: Long,
      frame_no: Int,
      width: Int,
      height: Int,
      px_sum: Long)

  final case class VideoDecode(
      asset_id: Long,
      ok: Boolean,
      n_frames: Option[Int],
      err: Option[String])

  /** Per-row decode outcome for the audit/quarantine path. */
  final case class ImageDecode(
      asset_id: Long,
      ok: Boolean,
      width: Option[Int],
      height: Option[Int],
      channels: Option[Int],
      err: Option[String])

  final case class AudioDecode(
      asset_id: Long,
      ok: Boolean,
      sample_rate: Option[Int],
      n_samples: Option[Long],
      rms: Option[Double],
      err: Option[String])

  /** Real image decode + grid-pooled embedding. Undecodable payloads are
    * DROPPED here (use [[decodeImages]] when the rejects matter); decode
    * runs inside the partition iterator so per-batch setup amortizes. */
  def imageFeatures(assets: Dataset[MediaAsset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.flatMap { a =>
        readImage(a.payload).toOption.map { img =>
          ImageFeatures(
            asset_id = a.asset_id,
            width = img.getWidth,
            height = img.getHeight,
            channels = img.getRaster.getNumBands,
            embedding = poolEmbedding(img))
        }
      }
    }
  }

  /** Real audio decode: sample rate and frame count from the container
    * header, RMS from the decoded PCM16 samples. Undecodable payloads are
    * dropped (see [[decodeAudio]] for the audited variant). */
  def audioFeatures(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.flatMap { a =>
        readAudio(a.payload).toOption.map { case (rate, frames, rms) =>
          AudioFeatures(a.asset_id, rate, frames, rms)
        }
      }
    }
  }

  /** Audited image decode: every input row yields exactly one output row,
    * ok=false carrying the reject reason instead of failing the task. */
  def decodeImages(assets: Dataset[MediaAsset]): Dataset[ImageDecode] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        readImage(a.payload) match {
          case Right(img) => ImageDecode(a.asset_id, ok = true,
            Some(img.getWidth), Some(img.getHeight),
            Some(img.getRaster.getNumBands), None)
          case Left(err) => ImageDecode(a.asset_id, ok = false,
            None, None, None, Some(err))
        }
      }
    }
  }

  /** Audited audio decode — same contract as [[decodeImages]]. */
  def decodeAudio(assets: Dataset[MediaAsset]): Dataset[AudioDecode] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        readAudio(a.payload) match {
          case Right((rate, frames, rms)) => AudioDecode(a.asset_id, ok = true,
            Some(rate), Some(frames), Some(rms), None)
          case Left(err) => AudioDecode(a.asset_id, ok = false,
            None, None, None, Some(err))
        }
      }
    }
  }

  /** REAL video frame sampling: demux a multi-frame container (animated GIF —
    * the one video-ish format `javax.imageio` genuinely demuxes) and keep
    * every `stride`-th decoded frame. Only the frame's measured features
    * (dims, pixel sum) leave the partition; raster bytes never reach a
    * shuffle. Undecodable payloads are dropped here — [[decodeVideo]] is the
    * audited variant. Decode is strided at the READ level: skipped frames are
    * never rasterized (GIF LZW still streams past them, but no pixel work). */
  def sampleFrames(assets: Dataset[MediaAsset], stride: Int = 4): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.flatMap(a => demuxPayload(a.payload, stride).toOption.toSeq.flatten
        .map { case (no, w, h, sum) => VideoFrame(a.asset_id, no, w, h, sum) })
    }
  }

  /** Audited video demux — one row per asset, ok=false on container errors.
    * Counts frames from the container directory without rasterizing them,
    * so the audit is cheap even on long clips. */
  def decodeVideo(assets: Dataset[MediaAsset]): Dataset[VideoDecode] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions { it =>
      it.map { a =>
        countFrames(a.payload) match {
          case Right(n) => VideoDecode(a.asset_id, ok = true, Some(n), None)
          case Left(err) => VideoDecode(a.asset_id, ok = false, None, Some(err))
        }
      }
    }
  }

  /** One REALLY resized image: the output dims, the re-encoded PNG
    * payload, and the pixel sum measured by decoding that payload BACK —
    * proving the emitted bytes are a valid lossless round trip, not just
    * an in-memory raster. */
  case class ResizedImage(
      asset_id: Long,
      ok: Boolean,
      out_w: Option[Int],
      out_h: Option[Int],
      pixel_sum: Option[Long],
      payload: Array[Byte],
      err: Option[String])

  /** REAL pixel resize: decode → nearest-neighbor resample → re-encode
    * PNG → decode the re-encoded bytes and measure them. The sampling map
    * is pinned to `src(x·srcW div outW, y·srcH div outH)` (floor), NOT
    * delegated to AWT's scaling ops, so the resampled raster is exact
    * integer arithmetic any oracle can replay; PNG is lossless, so the
    * round-tripped pixel sum equals the resampled one — the q223 gate
    * hash-checks that chain end to end. Payload bytes never cross a
    * shuffle (everything happens inside the partition iterator);
    * undecodable inputs yield ok=false audit rows. */
  def resizeImages(assets: Dataset[MediaAsset], outW: Int, outH: Int): Dataset[ResizedImage] = {
    require(outW > 0 && outH > 0, s"target dims must be positive: $outW x $outH")
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      it.map { a =>
        readImage(a.payload) match {
          case Right(img) =>
            val srcW = img.getWidth
            val srcH = img.getHeight
            val gray = img.getRaster.getNumBands == 1
            val out = new java.awt.image.BufferedImage(outW, outH,
              if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            // band-wise raster copy: setRGB would route gray pixels
            // through sRGB color conversion (gamma LUT) and silently
            // change values; sample copies are conversion-free
            val srcR = img.getRaster
            val outR = out.getRaster
            val bands = srcR.getNumBands
            var y = 0
            while (y < outH) {
              val sy = y * srcH / outH
              var x = 0
              while (x < outW) {
                val sx = x * srcW / outW
                var b = 0
                while (b < bands) {
                  outR.setSample(x, y, b, srcR.getSample(sx, sy, b)); b += 1
                }
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val bytes = bos.toByteArray
            readImage(bytes) match {
              case Right(rt) =>
                val r = rt.getRaster
                var sum = 0L
                var yy = 0
                while (yy < rt.getHeight) {
                  var xx = 0
                  while (xx < rt.getWidth) {
                    sum += r.getSample(xx, yy, 0); xx += 1
                  }
                  yy += 1
                }
                ResizedImage(a.asset_id, ok = true, Some(rt.getWidth),
                  Some(rt.getHeight), Some(sum), bytes, None)
              case Left(err) =>
                ResizedImage(a.asset_id, ok = false, None, None, None,
                  Array.empty, Some(s"round-trip decode failed: $err"))
            }
          case Left(err) =>
            ResizedImage(a.asset_id, ok = false, None, None, None,
              Array.empty, Some(err))
        }
      }
    }
  }

  /** Metadata-only resize: records the target size in `meta` without
    * touching payload bytes (lazy resize — [[resizeImages]] is the eager
    * pixel path). Pure column ops: stays in whole-stage codegen. */
  def withResizeTarget(assets: DataFrame, w: Int, h: Int): DataFrame =
    assets.withColumn("meta",
      map_concat(col("meta"), map(
        lit("resize_w"), lit(w.toString),
        lit("resize_h"), lit(h.toString))))

  /** Join image embeddings back to a metadata table WITHOUT carrying the
    * payload through the shuffle — the projection happens before the join. */
  def embeddingsForJoin(assets: Dataset[MediaAsset]): DataFrame = {
    imageFeatures(assets).toDF()
      .select(col("asset_id"), col("embedding")) // payload long gone
  }

  // ---- decode internals (executor-side; exceptions become reject rows) ----

  private def readImage(bytes: Array[Byte]): Either[String, java.awt.image.BufferedImage] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) Left("unrecognized image format") else Right(img)
    } catch {
      case e: Exception => Left(s"image decode failed: ${e.getClass.getSimpleName}")
    }

  /** Multi-frame container demux via ImageIO's sequence reader (GIF in a
    * bare JVM; TIFF readers plug into the same path). Returns every
    * `stride`-th frame as (frame_no, width, height, pixel-sample sum) —
    * the sum accumulates `getRGB & 0xff` (palette-resolved intensity), exact
    * in Long for any frame under 2^45 pixels. */
  private def demuxPayload(
      bytes: Array[Byte], stride: Int): Either[String, Seq[(Int, Int, Int, Long)]] =
    withReader(bytes) { reader =>
      val n = reader.getNumImages(true)
      (0 until n).filter(_ % stride == 0).map { i =>
        val img = reader.read(i)
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { sum += img.getRGB(x, y) & 0xff; x += 1 }
          y += 1
        }
        (i, w, h, sum)
      }
    }

  private def countFrames(bytes: Array[Byte]): Either[String, Int] =
    withReader(bytes)(_.getNumImages(true))

  private def withReader[A](bytes: Array[Byte])(
      f: javax.imageio.ImageReader => A): Either[String, A] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Left("unrecognized container format")
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            Right(f(reader))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch {
      case e: Exception => Left(s"video demux failed: ${e.getClass.getSimpleName}")
    }

  /** WAV/AIFF/AU → (sampleRate, frameCount, rms of normalized samples).
    * RMS is computed over all channels from the 16-bit PCM stream; the
    * sum-of-squares accumulates in double (exact for any realistic clip:
    * 2^30 samples of amplitude 2^15 stay under 2^53). */
  private def readAudio(bytes: Array[Byte]): Either[String, (Int, Long, Double)] =
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16)
          Left(s"unsupported sample size: ${fmt.getSampleSizeInBits}")
        else {
          val frames = in.getFrameLength
          val data = in.readAllBytes()
          var sumSq = 0.0
          var n = 0L
          var i = 0
          val big = fmt.isBigEndian
          while (i + 1 < data.length) {
            val s =
              if (big) ((data(i) << 8) | (data(i + 1) & 0xff)).toShort
              else ((data(i + 1) << 8) | (data(i) & 0xff)).toShort
            sumSq += s.toDouble * s.toDouble
            n += 1
            i += 2
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n) / 32768.0
          Right((fmt.getSampleRate.toInt, frames, rms))
        }
      } finally in.close()
    } catch {
      case _: UnsupportedAudioFileException => Left("unrecognized audio format")
      case e: Exception => Left(s"audio decode failed: ${e.getClass.getSimpleName}")
    }

  /** Integer 1-D DCT-II basis, orthonormal scaling, quantized to 1e4:
    * DctW(u)(x) = round(1e4 · c(u) · cos(π(2x+1)u/16)) with c(0)=√(1/8),
    * c(u>0)=√(2/8). The SAME 64 literals are baked into the q232 oracle
    * SQL, so the encoder is engine-portable integer arithmetic — no
    * transcendental is ever evaluated at query time (the repo's ndcgW /
    * rboSW weight-table discipline). */
  private[multimodal] val DctW: Array[Array[Long]] = Array(
    Array(3536L, 3536L, 3536L, 3536L, 3536L, 3536L, 3536L, 3536L),
    Array(4904L, 4157L, 2778L, 975L, -975L, -2778L, -4157L, -4904L),
    Array(4619L, 1913L, -1913L, -4619L, -4619L, -1913L, 1913L, 4619L),
    Array(4157L, -975L, -4904L, -2778L, 2778L, 4904L, 975L, -4157L),
    Array(3536L, -3536L, -3536L, 3536L, 3536L, -3536L, -3536L, 3536L),
    Array(2778L, -4904L, 975L, 4157L, -4157L, -975L, 4904L, -2778L),
    Array(1913L, -4619L, 4619L, -1913L, -1913L, 4619L, -4619L, 1913L),
    Array(975L, -2778L, 4157L, -4904L, 4904L, -4157L, 2778L, -975L))

  /** Block-DCT image encoder (the pHash front end; Zauner 2010): pinned
    * nearest-neighbor resample of the decoded raster to 8×8 gray (the same
    * `x·w div 8` source map as [[resizeImages]]), then a 2-D DCT-II with
    * the integer basis [[DctW]]; the embedding is the 16 LOW-FREQUENCY
    * coefficients (u, v ∈ 0..3, cell = v·4 + u), i.e. the perceptual
    * content a near-dup/similarity stack keys on — real fixed-weight
    * pixel math end to end, no stand-in anywhere.
    *
    * Exactness contract with the q232 oracle: gray is the band-SUMMED
    * integer sample, so each coefficient numerator is an exact Long
    * (≤ 64 · 4904² · 765 ≈ 1.2e12 < 2⁵³); for the equal-band fixtures the
    * numerator is bands·M against the oracle's M, and the final division
    * num / (bands · 2.56e11) has the identical rational value as the
    * oracle's M / 2.56e11 — correctly-rounded IEEE division then yields
    * the identical double on both engines, and DOUBLE→float32 rounds the
    * same way in the JVM and DuckDB. The 2.56e11 scale puts the DC
    * coefficient of a saturated image at ~0.80, so |v| ≤ 1. */
  private def poolEmbedding(img: java.awt.image.BufferedImage): Array[Float] = {
    val raster = img.getRaster
    val bands = raster.getNumBands
    val w = img.getWidth
    val h = img.getHeight
    val g = new Array[Long](64)
    var y = 0
    while (y < 8) {
      val sy = y * h / 8
      var x = 0
      while (x < 8) {
        val sx = x * w / 8
        var s = 0L
        var b = 0
        while (b < bands) { s += raster.getSample(sx, sy, b); b += 1 }
        g(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](16)
    var cell = 0
    while (cell < 16) {
      val wu = DctW(cell % 4)
      val wv = DctW(cell / 4)
      var num = 0L
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) {
          num += wu(xx) * wv(yy) * g(yy * 8 + xx)
          xx += 1
        }
        yy += 1
      }
      out(cell) = (num.toDouble / (bands * 256000000000.0)).toFloat
      cell += 1
    }
    out
  }
}
