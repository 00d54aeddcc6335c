package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkTestBase {

  test("curation composes: monotone counts, near-dups collapse, annotations present") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    // add exact duplicates to exercise that stage
    val withDups = docs.unionByName(
      docs.limit(20).withColumn("doc_id", $"doc_id" + 100000))

    val (out, stats) = CurationPipeline.curate(withDups, minQuality = 0.0)

    assert(stats.input == 520)
    assert(stats.afterQuality <= stats.input)
    assert(stats.afterExact == stats.afterQuality - 20) // planted exacts collapse
    assert(stats.afterNear < stats.afterExact)          // planted near-dups collapse
    assert(out.count() == stats.afterNear)
    assert(out.columns.contains("quality_score") && out.columns.contains("predicted_lang"))
    // survivors unique by id and by content hash
    assert(out.select("doc_id").distinct().count() == stats.afterNear)
    assert(out.select(md5($"text")).distinct().count() == stats.afterNear)
  }
}
