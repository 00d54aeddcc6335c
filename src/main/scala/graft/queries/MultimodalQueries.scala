package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.multimodal.MediaPipeline
import graft.multimodal.MediaPipeline.MediaAsset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal plumbing under the oracle: documents' bytes become media
  * payloads (image/audio/video round-robin by id), flow through the REAL
  * MediaPipeline operators (typed Dataset, mapPartitions/flatMap batch
  * shapes, encoders), and the checked output is only fields the oracle can
  * derive arithmetically from payload length — embedding dimensionality,
  * synthetic sample counts, strided frame counts. The hash-derived stub
  * fields (pseudo-pixels, RMS) stay engine-side; their determinism is
  * covered by MediaPipelineSpec.
  */
object MultimodalQueries extends QueryModule {

  /** q54: per-asset metric by modality —
    * image: embedding length (16), audio: n_samples = len·128,
    * video: frames kept by stride-4 sampling of 16 chunks. */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaAsset(id, kind, text.getBytes("UTF-8"), Map("origin" -> "documents"))
      }
    val images = MediaPipeline.imageFeatures(assets).toDF()
      .select($"asset_id", lit("image").as("kind"),
        size($"embedding").cast("long").as("metric"))
    val audio = MediaPipeline.audioFeatures(assets).toDF()
      .select($"asset_id", lit("audio").as("kind"), $"n_samples".as("metric"))
    val video = MediaPipeline.sampleFrames(assets).toDF()
      .groupBy($"asset_id")
      .agg(count(lit(1)).as("metric"))
      .select($"asset_id", lit("video").as("kind"), $"metric")
    images.unionByName(audio).unionByName(video)
      .orderBy($"asset_id")
  }
  private val q54Sql =
    """WITH d AS (SELECT doc_id AS asset_id, octet_length(encode(text)) AS len,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind
      |  FROM documents)
      |SELECT asset_id, kind,
      |  CASE kind
      |    WHEN 'image' THEN 16
      |    WHEN 'audio' THEN len * 128
      |    ELSE ((((len + greatest(len // 16, 1) - 1) // greatest(len // 16, 1)) + 3) // 4)
      |  END AS metric
      |FROM d ORDER BY asset_id""".stripMargin

  /** q141: frame-level sampling output — the 1→N explode at ROW
    * granularity (q54 checks only per-asset counts): every video asset's
    * stride-4 sampled frames with their byte lengths. Frame boundaries
    * are pure arithmetic over payload length (chunks of max(len/16, 1),
    * ceil-division count, short final chunk), so the oracle reproduces
    * each frame's length without seeing a byte of the payload — the
    * payload itself is dropped in the same projection that measures it,
    * before any exchange (the MediaPipeline rule: features move, bytes
    * do not). */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        MediaAsset(id, if (id % 3 == 2) "video" else "other",
          text.getBytes("UTF-8"), Map.empty)
      }
    MediaPipeline.sampleFrames(assets).toDF()
      .select($"asset_id", $"frame_no",
        length($"frame_payload").cast("long").as("frame_len"))
      .orderBy($"asset_id", $"frame_no")
  }
  private val q141Sql =
    """WITH d AS (SELECT doc_id AS asset_id,
      |    octet_length(encode(text)) AS len
      |  FROM documents WHERE doc_id % 3 = 2),
      |p AS (SELECT asset_id, len, greatest(len // 16, 1) AS fs FROM d),
      |n AS (SELECT asset_id, len, fs, (len + fs - 1) // fs AS nchunks FROM p),
      |f AS (SELECT asset_id, t.i AS frame_no,
      |    CASE WHEN t.i < nchunks - 1 THEN fs
      |      ELSE len - fs * (nchunks - 1) END AS frame_len
      |  FROM n, UNNEST(range(0, nchunks)) AS t(i)
      |  WHERE t.i % 4 = 0)
      |SELECT asset_id, CAST(frame_no AS INT) AS frame_no,
      |  CAST(frame_len AS BIGINT) AS frame_len
      |FROM f ORDER BY asset_id, frame_no""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q54_multimodal_metrics", q54, Some(q54Sql)),
    QueryDef("q141_frame_sample", q141, Some(q141Sql)),
  )
}
