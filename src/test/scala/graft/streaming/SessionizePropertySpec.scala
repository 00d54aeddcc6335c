package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Randomized real-exec validation of `sessionize`'s complete rule set
  * (q337 pins one staged corpus; this pins the rules on random
  * multi-batch fixtures):
  *   - input filter at the EVICTION watermark (FmgwsLateFilterSpec's
  *     contract): batch-n rows with t ≤ wm(n−1) never reach the function;
  *   - within a batch, a key's surviving rows run the gap automaton in
  *     (ts, value) order; extension absorbs with end = max(end, t);
  *   - a gap > G closes and emits the open session;
  *   - the armed timeout is end + G; it fires in the first batch where
  *     the key has no surviving data and end + G < wm(batch−1), emitting
  *     the open session;
  *   - wm(n) = ms-floored max input event time through batch n − delay,
  *     with delay = G (sessionize couples them).
  * Emission CONTENT is timing-independent, so the model reduces to the
  * per-key gap automaton over surviving rows plus a final-session rule. */
class SessionizePropertySpec extends SparkTestBase {

  private val GapMs = 600000L // 10 minutes; delay = gap in sessionize
  private val Day = 86400000L // ms

  private case class Open(start: Long, end: Long, n: Long)

  /** Plain-Scala replay of the composed rules; returns emitted sessions. */
  private def replay(batches: Seq[Seq[(Long, Long)]]): Set[(Long, Long, Long, Long)] = {
    var wmPrev = Long.MinValue // wm through the previous batch
    var maxSeen = Long.MinValue
    var state = Map.empty[Long, Open]
    var out = Set.empty[(Long, Long, Long, Long)]
    for (batch <- batches) {
      val surviving = batch.filter { case (_, t) => wmPrev == Long.MinValue || t > wmPrev }
      val byKey = surviving.groupBy(_._1)
      byKey.foreach { case (k, rows) =>
        var open = state.get(k)
        rows.map(_._2).sorted.foreach { t =>
          open match {
            case Some(s) if t - s.end <= GapMs =>
              open = Some(Open(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              out += ((k, s.start, s.end, s.n))
              open = Some(Open(t, t, 1))
            case None => open = Some(Open(t, t, 1))
          }
        }
        state += k -> open.get
      }
      batch.foreach { case (_, t) => maxSeen = math.max(maxSeen, t) }
      if (maxSeen != Long.MinValue) wmPrev = maxSeen - GapMs
    }
    // Timeout sweep: the engine schedules a NO-DATA micro-batch whenever
    // the watermark advances (noDataMicroBatches, default on), so every
    // armed horizon is eventually checked against the FINAL watermark —
    // and a mid-stream firing emits the identical session content (a
    // later same-key event always exceeds end + G: it had to pass the
    // eviction filter at a watermark already above the fired horizon, so
    // the gap rule reproduces the same split). One final sweep therefore
    // models every firing: emit iff end + G < wm(last), strictly.
    state.foreach { case (k, s) =>
      if (wmPrev != Long.MinValue && s.end + GapMs < wmPrev)
        out += ((k, s.start, s.end, s.n))
    }
    out
  }

  test("random multi-batch fixtures: real exec == composed-rule replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rnd = new scala.util.Random(33700L)
    for (trial <- 1 to 6) {
      val nBatches = 2 + rnd.nextInt(3)
      val nKeys = 3 + rnd.nextInt(4)
      // per key: a strictly increasing event stream dealt across batches
      // in order (the operator's in-order-per-key assumption; cross-key
      // disorder within and across batches is unconstrained)
      val batches = Array.fill(nBatches)(Seq.newBuilder[(Long, Long)])
      (1 to nKeys).foreach { k =>
        val nEv = 1 + rnd.nextInt(6)
        val times = Seq.fill(nEv)(Day + rnd.nextInt(600) * 60000L)
          .distinct.sorted
        var b = 0
        times.foreach { t =>
          b = math.min(nBatches - 1, b + rnd.nextInt(2))
          batches(b) += ((k.toLong, t))
        }
      }
      val fixture = batches.map(_.result()).toSeq
      val input = MemoryStream[StreamingOps.Event]
      val sink = s"sess_prop_$trial"
      val q = StreamingOps.sessionize(
          input.toDS(), gapSeconds = GapMs / 1000)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append).start()
      try {
        fixture.foreach { b =>
          if (b.nonEmpty)
            input.addData(b.map { case (k, t) =>
              StreamingOps.Event(k, new Timestamp(t), "e", 0.0)
            })
          else input.addData(Seq(
            StreamingOps.Event(-1L, new Timestamp(Day - GapMs), "e", 0.0)))
          q.processAllAvailable()
        }
        val got = spark.table(sink).as[StreamingOps.Session].collect()
          .map(s => (s.user_id, s.session_start.getTime,
            s.session_end.getTime, s.n_events)).toSet
        val padded = fixture.map(b =>
          if (b.isEmpty) Seq((-1L, Day - GapMs)) else b)
        val want = replay(padded)
        assert(got == want,
          s"trial $trial diverged\nfixture=$padded\ngot=$got\nwant=$want")
      } finally q.stop()
    }
  }
}
