package graft.streaming

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.pipeline.Catalog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming component maintenance: after streaming pair batches through
  * the foreachBatch label sink, the persisted labeling must equal a full
  * batch recompute over every pair ever seen — groups that straddle
  * micro-batches merge correctly, and replays are idempotent. */
class StreamingComponentsSpec extends SparkTestBase {

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("streamed pair batches converge to the full-recompute labeling") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val cat = new Catalog(spark, tmpDir("stream-cc"))
    val input = MemoryStream[(Long, Long)]
    // batch 1: {1,2,3} and {10,11}; batch 2 bridges 3-10 (cross-batch
    // merge: the whole thing becomes one component labeled 1) + new {20,21}
    input.addData((1L, 2L), (2L, 3L), (10L, 11L))
    val q1 = input.toDF().toDF("a", "b").writeStream
      .foreachBatch(StreamingComponents.labelSink(cat, "cc", "a", "b"))
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    assert(labelsOf(cat.read("cc")) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

    input.addData((3L, 10L), (20L, 21L))
    val q2 = input.toDF().toDF("a", "b").writeStream
      .foreachBatch(StreamingComponents.labelSink(cat, "cc", "a", "b"))
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val streamed = labelsOf(cat.read("cc"))
    val full = labelsOf(Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L), (20L, 21L)).toDF("a", "b"),
      "a", "b"))
    assert(streamed == full, s"streamed=$streamed full=$full")
    assert(streamed(11L) == 1L, "cross-batch bridge did not merge components")
  }

  test("replaying a batch against committed state is idempotent") {
    import spark.implicits._
    val cat = new Catalog(spark, tmpDir("stream-cc-replay"))
    val sink = StreamingComponents.labelSink(cat, "cc", "a", "b")
    val batch = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    sink(batch, 0L)
    val first = labelsOf(cat.read("cc"))
    sink(batch, 0L) // crash-replay of the same batch
    assert(labelsOf(cat.read("cc")) == first)
  }
}
