package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming curation routing: the hash-split assignment is a pure
  * function of the id, so the streaming router lands every document in
  * the exact shard the batch q60 logic would assign — batch/stream
  * parity of the curation split. */
class StreamingSplitSpec extends SparkTestBase {

  test("routeBySplit partitions a stream identically to the batch assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val outDir = tmpDir("split-out") + "/docs"
    val ckDir = tmpDir("split-ck")

    val in = MemoryStream[(Long, String)]
    in.addData((0L until 200L).map(i => (i, s"doc $i text")): _*) // before start
    val q = StreamingOps.routeBySplit(
        in.toDF().toDF("doc_id", "text"), "doc_id")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .partitionBy("split")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val back = spark.read.parquet(outDir)
    assert(back.count() == 200)
    // physical layout: Hive-style split= partitions on disk
    val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("split=")).toSet
    assert(dirs == Set("split=train", "split=eval"), s"got $dirs")

    // every row matches the batch assignment function
    val expected = spark.range(200).select($"id".as("doc_id"),
      graft.queries.CurationQueries.splitColumn("doc_id").as("exp_split"))
    val mismatches = back.join(expected, "doc_id")
      .filter($"split" =!= $"exp_split").count()
    assert(mismatches == 0)
    // and the eval fraction is the configured ~10%
    val nEval = back.filter($"split" === "eval").count()
    assert(nEval > 5 && nEval < 40, s"eval fraction off: $nEval/200")
  }
}
