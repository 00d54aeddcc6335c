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

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q54_multimodal_metrics", q54, Some(q54Sql)),
  )
}
