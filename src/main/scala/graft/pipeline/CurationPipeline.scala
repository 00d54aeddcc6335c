package graft.pipeline

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a corpus actually
  * runs, wiring the extension modules into one pipeline —
  *
  *   raw documents
  *     → token/quality annotation  (projection, no shuffle)
  *     → quality filter            (pushed predicate)
  *     → exact dedup               (one hash shuffle)
  *     → near dedup (MinHash+LSH)  (banded candidate join)
  *     → language annotation       (projection)
  *
  * Ordering matters at scale: cheap projections and selective filters run
  * BEFORE the shuffling dedup stages so every exchange moves the smallest
  * surviving corpus; exact dedup precedes near-dedup so LSH never wastes
  * bands on identical texts.
  */
object CurationPipeline {

  final case class Stats(
      input: Long, afterQuality: Long, afterExact: Long, afterNear: Long)

  def curate(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
             minQuality: Double = 0.5): (DataFrame, Stats) = {
    val input = docs.count()

    val quality = TextAnalysis.filterByQuality(docs, minQuality, textCol)
      .select(docs.columns.map(col): _*) // annotation columns served the filter
    val nQuality = quality.count()

    val exact = Dedup.exact(quality, idCol, Seq(textCol))
    val nExact = exact.count()

    val near = Dedup.nearMinhash(exact, idCol, textCol)
    val nNear = near.count()

    val annotated = TextAnalysis.withLangId(
      TextAnalysis.withQualityScore(near, textCol), textCol)

    (annotated, Stats(input, nQuality, nExact, nNear))
  }
}
