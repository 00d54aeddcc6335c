package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming exact dedup: dropDuplicates with a watermark bounds state and
  * suppresses re-emission of keys across micro-batches. */
class StreamingDedupSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked dropDuplicates emits each key once across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_type")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("2026-01-01 00:00:00"), "click", 1.0),
        Event(2, ts("2026-01-01 00:00:01"), "click", 2.0), // same key, same batch
        Event(3, ts("2026-01-01 00:00:02"), "view", 3.0))
      q.processAllAvailable()
      input.addData(
        Event(4, ts("2026-01-01 00:01:00"), "click", 4.0), // dup across batches
        Event(5, ts("2026-01-01 00:01:01"), "scroll", 5.0))
      q.processAllAvailable()
      val types = spark.table("dedupstream").select("event_type")
        .collect().map(_.getString(0)).sorted
      assert(types.toSeq == Seq("click", "scroll", "view"))
    } finally q.stop()
  }
}
