package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.streaming.StreamingOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming semantics via MemoryStream micro-batches. */
class StreamingOpsSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedStats: tumbling window aggregates with watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts("2026-01-01 00:00:10"), "click", 1.0),
      Event(1, ts("2026-01-01 00:00:40"), "click", 3.0),
      Event(2, ts("2026-01-01 00:01:10"), "view", 5.0))
    val q = windowedStats(input.toDF(), window = "1 minute", watermark = "2 minutes")
      .writeStream.format("memory").queryName("winstats")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("winstats").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("avg_value")))
        .sortBy(t => (t._1, t._2))
      assert(rows.toSeq == Seq(
        ("2026-01-01 00:00:00.0", "click", 2L, 2.0),
        ("2026-01-01 00:01:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("sessionize: gap closes a session, state carries the open one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events 10s apart (one session), then a 5-minute gap
      input.addData(
        Event(7, ts("2026-01-01 00:00:00"), "click", 1.0),
        Event(7, ts("2026-01-01 00:00:10"), "click", 1.0))
      q.processAllAvailable()
      assert(spark.table("sessions").count() == 0) // still open, nothing emitted

      // batch 2: event past the gap → previous session closes
      input.addData(Event(7, ts("2026-01-01 00:05:00"), "click", 1.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[Session].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7L)
      assert(closed.head.session_start == ts("2026-01-01 00:00:00"))
      assert(closed.head.session_end == ts("2026-01-01 00:00:10"))
      assert(closed.head.n_events == 2L)
    } finally q.stop()
  }

  test("sessionize: multiple keys stay independent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts("2026-01-01 00:00:00"), "a", 0.0),
        Event(2, ts("2026-01-01 00:00:00"), "b", 0.0))
      q.processAllAvailable()
      input.addData(
        Event(1, ts("2026-01-01 00:10:00"), "a", 0.0)) // closes user 1 via gap
      q.processAllAvailable()
      val closed = spark.table("sessions2").as[Session].collect()
      // user 1 closed by the gap rule; user 2's idle session may also have
      // been flushed by the event-time timeout once the watermark passed it
      val u1 = closed.filter(_.user_id == 1L)
      assert(u1.length == 1 && u1.head.n_events == 1L &&
        u1.head.session_end == ts("2026-01-01 00:00:00"))
      assert(closed.filter(_.user_id == 2L).forall(_.n_events == 1L))
    } finally q.stop()
  }

  test("sessionize: an out-of-order within-gap event absorbs without shrinking the session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 600)
      .writeStream.format("memory").queryName("sessions4")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: session [00:00, 00:08]; watermark stays far behind
      input.addData(
        Event(5, ts("2026-01-01 00:00:00"), "a", 0.0),
        Event(5, ts("2026-01-01 00:08:00"), "a", 0.0))
      q.processAllAvailable()
      // batch 2: OUT-OF-ORDER event at 00:04 — above the watermark, below
      // the session end; must absorb (n=3), not shrink end to 00:04
      input.addData(Event(5, ts("2026-01-01 00:04:00"), "a", 0.0))
      q.processAllAvailable()
      // batch 3: event past the gap from 00:08 closes the session; if the
      // end had shrunk to 00:04, [00:04+gap] would misclassify 00:15 too
      input.addData(Event(5, ts("2026-01-01 00:20:00"), "a", 0.0))
      q.processAllAvailable()
      val closed = spark.table("sessions4").as[Session].collect()
      assert(closed.length == 1 && closed.head.n_events == 3L &&
        closed.head.session_end == ts("2026-01-01 00:08:00"), closed.toSeq.toString)
    } finally q.stop()
  }
}
