package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Pins the watermark contract behind `sessionize`'s unguarded
  * `setTimeoutTimestamp(end + gap)` and q337's staging-legality argument:
  * FlatMapGroupsWithState filters late input against the EVICTION
  * watermark (the current batch's value, through batch n−1) — NOT the
  * one-batch-lagged late-events watermark that aggregations and
  * dropDuplicatesWithinWatermark use (q329 / DedupThenAggPropertySpec).
  * A row BETWEEN the two watermarks therefore never reaches the user
  * function — which is exactly what makes end+gap always a legal
  * (post-watermark) timeout for rows that DO arrive. */
object FmgwsLateFilterLog {
  val calls = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
}

class FmgwsLateFilterSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("a row between the lagged and eviction watermarks is dropped before the function") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    FmgwsLateFilterLog.calls.clear()
    val input = MemoryStream[StreamingOps.Event]
    val ds = input.toDS()
      .withWatermark("ts", "60 seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[StreamingOps.Event], st: GroupState[Long]) =>
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            rows.foreach(e => FmgwsLateFilterLog.calls.add((uid, e.ts.getTime)))
            st.update(0L)
            Iterator.empty
          }
      }
    val q = ds.writeStream.format("memory").queryName("fmgws_latefilter")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: wm(1) = 00:00:00; batch 2: wm(2) = 00:59:00
      input.addData(StreamingOps.Event(9, ts("2026-01-01 00:01:00"), "a", 0.0))
      q.processAllAvailable()
      input.addData(StreamingOps.Event(9, ts("2026-01-01 01:00:00"), "a", 0.0))
      q.processAllAvailable()
      // batch 3: key 8 @00:30 is ABOVE the lagged watermark (00:00) but
      // BELOW the eviction watermark (00:59). An aggregation/dedup would
      // accept it; fMGWS must drop it before the function.
      input.addData(StreamingOps.Event(8, ts("2026-01-01 00:30:00"), "a", 0.0))
      q.processAllAvailable()
      assert(q.exception.isEmpty, q.exception.toString)
      import scala.jdk.CollectionConverters._
      val calls = FmgwsLateFilterLog.calls.asScala.toSeq
      assert(calls.count(_._1 == 9L) == 2, calls.toString)
      assert(!calls.exists(_._1 == 8L),
        s"late row reached the function — the eviction-watermark filter " +
          s"contract changed: $calls")
    } finally q.stop()
  }
}
