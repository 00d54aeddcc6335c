package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("token stats are self-consistent") {
    import spark.implicits._
    val out = TextAnalysis.withTokenStats(docs).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_ws_tokens") > 0)
      assert(r.getAs[Int]("n_bpe_tokens") >= r.getAs[Int]("n_ws_tokens") - 1)
      val sr = r.getAs[Double]("stop_ratio")
      assert(sr >= 0.0 && sr <= 1.0)
    }
  }

  test("quality filter is monotone in threshold and stays in [0,1]") {
    val scored = TextAnalysis.withQualityScore(docs)
    val scores = scored.select("quality_score").collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    val n09 = TextAnalysis.filterByQuality(docs, 0.9).count()
    val n05 = TextAnalysis.filterByQuality(docs, 0.5).count()
    val n00 = TextAnalysis.filterByQuality(docs, 0.0).count()
    assert(n09 <= n05 && n05 <= n00 && n00 == docs.count())
  }

  test("lang id emits a known label per row; fingerprints are stable") {
    val labels = TextAnalysis.withLangId(docs).select("predicted_lang")
      .distinct().collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("en", "fr", "es", "de", "unknown")))

    val fp1 = TextAnalysis.withFingerprints(docs)
      .select("doc_id", "content_md5", "rolling_fp").collect()
    val fp2 = TextAnalysis.withFingerprints(docs)
      .select("doc_id", "content_md5", "rolling_fp").collect()
    assert(fp1.map(_.toString).sorted.sameElements(fp2.map(_.toString).sorted))
  }
}
