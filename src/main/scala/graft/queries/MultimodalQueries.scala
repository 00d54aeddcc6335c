package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.multimodal.{MediaFixtures, MediaPipeline}
import graft.multimodal.MediaPipeline.MediaAsset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal decode under the oracle: documents' ids parameterize REAL
  * synthetic media ([[MediaFixtures]] — PNG via ImageIO, WAV as RIFF/PCM16),
  * the payloads are encoded AND decoded distributed on executors through the
  * real `javax.imageio`/`javax.sound.sampled` codecs in MediaPipeline, and
  * the checked output is decoded properties (dimensions, bands, sample rate,
  * frame count, RMS) that the oracle recomputes arithmetically from the id —
  * DuckDB never sees a payload byte, so a hash match proves the decode is
  * real and exact. Video is real as well: animated GIFs demuxed frame by
  * frame through ImageIO's sequence reader, each sampled frame's dimensions
  * and pixel sum measured from the decoded raster (q141 at frame grain).
  */
object MultimodalQueries extends QueryModule {

  private def syntheticAsset(id: Long): MediaAsset = (id % 3) match {
    case 0 => MediaAsset(id, "image", MediaFixtures.pngPayload(id), Map("origin" -> "synthetic"))
    case 1 => MediaAsset(id, "audio", MediaFixtures.wavPayload(id), Map("origin" -> "synthetic"))
    case _ => MediaAsset(id, "video", MediaFixtures.gifPayload(id), Map("origin" -> "synthetic"))
  }

  /** q54: per-asset decoded metric by modality —
    * image: width/height/bands from the REAL PNG decode, packed as
    * (w·1000 + h)·10 + channels; audio: rate·100000 + frames from the REAL
    * WAV decode; video: frames kept by stride-2 sampling of the REAL GIF
    * demux (= ceil(container frame count / 2)). */
  private def q54(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id").as[Long].map(syntheticAsset)
    val images = MediaPipeline.imageFeatures(assets).toDF()
      .select($"asset_id", lit("image").as("kind"),
        (($"width" * 1000 + $"height") * 10 + $"channels")
          .cast("long").as("metric"))
    val audio = MediaPipeline.audioFeatures(assets).toDF()
      .select($"asset_id", lit("audio").as("kind"),
        ($"sample_rate".cast("long") * 100000L + $"n_samples").as("metric"))
    val video = MediaPipeline.sampleFrames(assets, stride = 2).toDF()
      .groupBy($"asset_id")
      .agg(count(lit(1)).as("metric"))
      .select($"asset_id", lit("video").as("kind"), $"metric")
    images.unionByName(audio).unionByName(video)
      .orderBy($"asset_id")
  }
  // mirrors MediaFixtures: imageWidth/Height/Gray, audioRate/Frames, videoFrameCount
  private val q54Sql =
    """SELECT doc_id AS asset_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |    ELSE 'video' END AS kind,
      |  CAST(CASE doc_id % 3
      |    WHEN 0 THEN
      |      ((8 + doc_id % 16) * 1000 + 8 + (doc_id // 16) % 16) * 10
      |        + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END
      |    WHEN 1 THEN
      |      (8000 * (1 + doc_id % 3)) * 100000 + 100 + doc_id % 50
      |    ELSE (3 + doc_id % 6 + 1) // 2
      |  END AS BIGINT) AS metric
      |FROM documents
      |ORDER BY asset_id""".stripMargin

  /** q141: frame-level demux output — the 1→N explode at ROW granularity
    * (q54 checks only per-asset counts): every video asset's GIF payload is
    * REALLY demuxed on executors (ImageIO sequence reader) and each stride-2
    * sampled frame reports its decoded width/height and raster pixel sum.
    * MediaFixtures writes constant-value frames through an identity gray
    * palette, so the pixel sum is exactly framePixel(id,f)·w·h — the oracle
    * recomputes all three columns arithmetically without a payload byte, and
    * a hash match proves the demux yields the right frames in the right
    * order with bit-exact pixels. Raster bytes die inside the partition
    * (the MediaPipeline rule: features move, bytes do not). */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id").as[Long]
      .map { id =>
        MediaAsset(id, if (id % 3 == 2) "video" else "other",
          if (id % 3 == 2) MediaFixtures.gifPayload(id) else Array.empty[Byte],
          Map.empty)
      }
    MediaPipeline.sampleFrames(assets, stride = 2).toDF()
      .orderBy($"asset_id", $"frame_no")
  }
  private val q141Sql =
    """WITH d AS (SELECT doc_id AS asset_id FROM documents WHERE doc_id % 3 = 2),
      |f AS (SELECT asset_id, t.i AS frame_no
      |  FROM d, UNNEST(range(0, 3 + asset_id % 6)) AS t(i)
      |  WHERE t.i % 2 = 0)
      |SELECT asset_id, CAST(frame_no AS INT) AS frame_no,
      |  CAST(8 + asset_id % 9 AS INT) AS width,
      |  CAST(8 + (asset_id // 9) % 9 AS INT) AS height,
      |  CAST(((asset_id + 17 * frame_no) % 251)
      |    * (8 + asset_id % 9) * (8 + (asset_id // 9) % 9) AS BIGINT) AS px_sum
      |FROM f ORDER BY asset_id, frame_no""".stripMargin

  /** q204: decode audit — every asset decodes to exactly one row, ok=false
    * rows carry NULL metrics instead of failing the scan (the quarantine
    * contract a 100 TB corpus with stray corrupt files needs). Ids divisible
    * by 17 get deliberately undecodable payloads; everything else round-trips
    * through the real codecs, and the decoded sample-rate/frame-count/RMS
    * and pixel dimensions are id-arithmetic for the oracle. The constant-
    * amplitude WAV makes the decoded RMS exactly amplitude/32768 (see
    * MediaFixtures), so even the floating-point column is hash-stable. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id").as[Long].map { id =>
        val kind = if (id % 2 == 0) "image" else "audio"
        val payload =
          if (id % 17 == 0) MediaFixtures.corruptPayload(id)
          else if (kind == "image") MediaFixtures.pngPayload(id)
          else MediaFixtures.wavPayload(id)
        MediaAsset(id, kind, payload, Map.empty)
      }
    val img = MediaPipeline.decodeImages(assets).toDF()
      .select($"asset_id", lit("image").as("kind"), $"ok",
        $"width", $"height", $"channels",
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("n_samples"),
        lit(null).cast("double").as("rms6"))
    val aud = MediaPipeline.decodeAudio(assets).toDF()
      .select($"asset_id", lit("audio").as("kind"), $"ok",
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("channels"),
        $"sample_rate", $"n_samples", round($"rms", 6).as("rms6"))
    img.unionByName(aud).orderBy($"asset_id")
  }
  private val q204Sql =
    """SELECT doc_id AS asset_id,
      |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
      |  doc_id % 17 <> 0 AS ok,
      |  CAST(CASE WHEN doc_id % 2 = 0 AND doc_id % 17 <> 0
      |    THEN 8 + doc_id % 16 END AS INTEGER) AS width,
      |  CAST(CASE WHEN doc_id % 2 = 0 AND doc_id % 17 <> 0
      |    THEN 8 + (doc_id // 16) % 16 END AS INTEGER) AS height,
      |  CAST(CASE WHEN doc_id % 2 = 0 AND doc_id % 17 <> 0
      |    THEN 1 END AS INTEGER) AS channels,
      |  CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 17 <> 0
      |    THEN 8000 * (1 + doc_id % 3) END AS INTEGER) AS sample_rate,
      |  CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 17 <> 0
      |    THEN 100 + doc_id % 50 END AS BIGINT) AS n_samples,
      |  CAST(CASE WHEN doc_id % 2 = 1 AND doc_id % 17 <> 0
      |    THEN round((1000 + (doc_id % 7) * 500) / 32768.0, 6)
      |  END AS DOUBLE) AS rms6
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q223: the REAL resize pipeline end to end — every image asset's PNG
    * is decoded on executors, nearest-neighbor resampled to 6×5 with the
    * pinned `src(x·w div 6, y·h div 5)` map, re-encoded as PNG, and the
    * re-encoded bytes decoded AGAIN to measure width/height/pixel-sum
    * (so the gate certifies emitted-payload validity and PNG
    * losslessness, not just an in-memory raster). The oracle never sees
    * a byte: it replays the resample arithmetic over the fixture's
    * id-parameterized pixel formula — 30 terms per asset via an
    * unnested 6×5 grid. */
  private def q223(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id").as[Long].map(syntheticAsset)
    MediaPipeline.resizeImages(assets, 6, 5).toDF()
      .filter($"ok")
      .select($"asset_id", $"out_w", $"out_h", $"pixel_sum")
      .orderBy($"asset_id")
  }
  private val q223Sql =
    """WITH img AS (SELECT doc_id AS id,
      |    8 + doc_id % 16 AS sw, 8 + (doc_id // 16) % 16 AS sh
      |  FROM documents WHERE doc_id % 3 = 0),
      |grid AS (SELECT i.id, i.sw, i.sh, x.x AS x, y.y AS y
      |  FROM img i, UNNEST(range(0, 6)) x(x), UNNEST(range(0, 5)) y(y))
      |SELECT id AS asset_id, 6 AS out_w, 5 AS out_h,
      |  CAST(sum(((x * sw // 6) * 7 + (y * sh // 5) * 13 + id) % 255)
      |    AS BIGINT) AS pixel_sum
      |FROM grid GROUP BY id ORDER BY asset_id""".stripMargin

  /** q232: the block-DCT image embedding itself, hash-gated cell by cell —
    * every image asset's PNG is decoded on executors and its 16-dim
    * encoder output (the vector SemDeDup/cosine-dedup/ANN consume) is
    * exploded to (asset_id, cell, v) rows. The encoder is pHash's front
    * end: pinned nearest-neighbor resample of the REAL raster to 8×8
    * gray, 2-D DCT-II with the integer basis [[graft.multimodal
    * .MediaPipeline.DctW]], low-frequency 4×4 coefficients out. The
    * oracle replays every step from the fixture's id-parameterized pixel
    * formula with the IDENTICAL 64 weight literals, so each coefficient
    * numerator is the same exact integer on both engines. Bit-exactness
    * of the float32 column holds because (a) IEEE division is correctly
    * rounded, so Spark's band-summed (3M)/(3·2.56e11) and the oracle's
    * M/2.56e11 — the same rational — round to the identical double, and
    * (b) DuckDB's DOUBLE→REAL cast and Java's `toFloat` are the same
    * round-to-nearest. A hash match proves the embedding is real
    * fixed-weight decoded-pixel math end to end — the link between the
    * multimodal path and the similarity stack that q54/q223 didn't pin. */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val assets = Tables.documents(s, dir)
      .select($"doc_id").as[Long]
      .map { id =>
        MediaAsset(id, if (id % 3 == 0) "image" else "other",
          if (id % 3 == 0) MediaFixtures.pngPayload(id) else Array.empty[Byte],
          Map.empty)
      }
    MediaPipeline.imageFeatures(assets).toDF()
      .select($"asset_id", posexplode($"embedding"))
      .select($"asset_id", $"pos".cast("int").as("cell"), $"col".as("v"))
      .orderBy($"asset_id", $"cell")
  }
  private val q232Sql =
    """WITH img AS (SELECT doc_id AS id,
      |    8 + doc_id % 16 AS w, 8 + (doc_id // 16) % 16 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |dw AS (SELECT [3536,3536,3536,3536,3536,3536,3536,3536,
      |  4904,4157,2778,975,-975,-2778,-4157,-4904,
      |  4619,1913,-1913,-4619,-4619,-1913,1913,4619,
      |  4157,-975,-4904,-2778,2778,4904,975,-4157,
      |  3536,-3536,-3536,3536,3536,-3536,-3536,3536,
      |  2778,-4904,975,4157,-4157,-975,4904,-2778,
      |  1913,-4619,4619,-1913,-1913,4619,-4619,1913,
      |  975,-2778,4157,-4904,4904,-4157,2778,-975] AS t),
      |g AS (SELECT i.id, x.i AS x, y.i AS y,
      |    ((x.i * i.w // 8) * 7 + (y.i * i.h // 8) * 13 + i.id) % 255 AS v
      |  FROM img i, UNNEST(range(0, 8)) AS x(i), UNNEST(range(0, 8)) AS y(i))
      |SELECT g.id AS asset_id, CAST(c.i AS INT) AS cell,
      |  CAST(CAST(sum(t[(c.i % 4) * 8 + g.x + 1]
      |      * t[(c.i // 4) * 8 + g.y + 1] * g.v) AS DOUBLE)
      |    / 256000000000.0 AS REAL) AS v
      |FROM g, dw, UNNEST(range(0, 16)) AS c(i)
      |GROUP BY 1, 2 ORDER BY asset_id, cell""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q54_multimodal_metrics", q54, Some(q54Sql)),
    QueryDef("q232_image_embedding", q232, Some(q232Sql)),
    QueryDef("q141_frame_sample", q141, Some(q141Sql)),
    QueryDef("q204_decode_audit", q204, Some(q204Sql)),
    QueryDef("q223_resize_pipeline", q223, Some(q223Sql)),
  )
}
