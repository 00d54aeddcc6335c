package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("exact dedup: identical texts collapse to min doc_id") {
    import spark.implicits._
    val withDups = docs.limit(50)
      .unionByName(docs.limit(10).withColumn("doc_id", $"doc_id" + 10000))
    val out = Dedup.exact(withDups, "doc_id", Seq("text"))
    assert(out.count() == 50)
    assert(out.filter($"doc_id" >= 10000).count() == 0) // min-id survivors
  }

  test("minhash near-dup: planted near-duplicates collapse") {
    val before = docs.count()
    val out = Dedup.nearMinhash(docs, "doc_id", "text")
    val removed = before - out.count()
    // sf0.01 has 25 planted near-dup pairs (jaccard >= 0.15); banding with
    // >= 2 agreeing bands recovers most — each collapsed pair removes one doc
    assert(removed >= 20 && removed <= 60, s"removed $removed")
    // survivors are group minima: no removed id smaller than its group's kept id
    assert(out.count() == out.select("doc_id").distinct().count())
  }

  test("cosine near-dup: high-threshold dedup keeps everything; low removes") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val keepAll = Dedup.nearCosine(emb, "vec_id", "embedding", threshold = 0.99)
    assert(keepAll.count() == emb.count()) // max pair cos is ~0.51
    val removeSome = Dedup.nearCosine(emb, "vec_id", "embedding", threshold = 0.4)
    // 59 pairs above 0.4 → at least a few docs drop
    assert(removeSome.count() < emb.count())
  }
}
