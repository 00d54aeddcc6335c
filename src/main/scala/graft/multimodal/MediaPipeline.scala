package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed by per-partition batch operators.
  *
  * The real codecs (JPEG/PNG decode, audio resample, video frame extraction)
  * are NOT available in this environment — every `decode*` below is a
  * clearly marked DETERMINISTIC STUB that derives its output from the
  * payload bytes alone, so the Spark-side contract (schema, encoders,
  * partition-iterator batch shape, column pruning of the heavy payload) is
  * real and testable, and swapping in a native codec later changes only the
  * function body, not the pipeline.
  *
  * Scale notes: payloads are the dominant bytes at 100 TB. Operators keep
  * them out of shuffles — features/metadata are projected BEFORE any wide
  * stage, and the payload column is dropped as early as possible. The
  * `mapPartitions` shape mirrors a batched UDF: amortized per-batch setup
  * (codec init), streaming iterators, no per-row JVM churn.
  */
object MediaPipeline {

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

  final case class VideoFrame(
      asset_id: Long,
      frame_no: Int,
      frame_payload: Array[Byte])

  /** DETERMINISTIC STUB for image decode + embed: a real implementation
    * decodes payload → pixels and runs a vision encoder; this derives
    * pseudo-dimensions and a 16-dim pseudo-embedding from a rolling hash of
    * the bytes. Batch shape, schema, and determinism are the contract. */
  def imageFeatures(assets: Dataset[MediaAsset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "image").mapPartitions { it =>
      // per-partition setup happens once here (codec init in the real impl)
      it.map { a =>
        val h = bytesHash(a.payload)
        val emb = Array.tabulate(16)(i =>
          (((h >>> (i * 2)) & 0xff).toInt / 255.0f) - 0.5f)
        ImageFeatures(
          asset_id = a.asset_id,
          width = 64 + (h & 0x3f).toInt * 8,
          height = 64 + ((h >>> 6) & 0x3f).toInt * 8,
          channels = 3,
          embedding = emb)
      }
    }
  }

  /** DETERMINISTIC STUB for audio decode: pseudo sample-rate/duration/RMS
    * from the byte stream (real impl: PCM decode + windowed RMS). */
  def audioFeatures(assets: Dataset[MediaAsset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "audio").mapPartitions { it =>
      it.map { a =>
        val h = bytesHash(a.payload)
        AudioFeatures(
          asset_id = a.asset_id,
          sample_rate = if ((h & 1) == 0) 44100 else 16000,
          n_samples = a.payload.length.toLong * 128,
          rms = ((h >>> 8) & 0xffff).toInt / 65535.0)
      }
    }
  }

  /** DETERMINISTIC STUB for video frame sampling: every `stride`-th slice
    * of the payload becomes a "frame" (real impl: container demux +
    * keyframe extraction). Explodes 1 → N rows, the shape that matters. */
  def sampleFrames(assets: Dataset[MediaAsset], stride: Int = 4): Dataset[VideoFrame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").flatMap { a =>
      val frameSize = math.max(1, a.payload.length / 16)
      a.payload.grouped(frameSize).zipWithIndex.collect {
        case (bytes, idx) if idx % stride == 0 =>
          VideoFrame(a.asset_id, idx, bytes)
      }
    }
  }

  /** Metadata-only resize: records the target size in `meta` without
    * touching payload bytes (lazy resize — the real decode applies it).
    * Pure column ops: stays in whole-stage codegen. */
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

  /** FNV-1a over the payload — the deterministic seed for every stub. */
  private def bytesHash(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
