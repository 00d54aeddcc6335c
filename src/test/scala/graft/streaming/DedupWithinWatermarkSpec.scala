package graft.streaming

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Engine-internal cross-check for the q329 dropDuplicatesWithinWatermark
  * gate: replays the probe-pinned state rules (first-event expiry, no
  * extension, inclusive end-of-batch eviction against the un-lagged
  * ms-floored watermark) in plain Scala over the same tercile staging,
  * and asserts the fixture exercises all three state paths — fresh
  * emission, absorb-while-alive, and evict-then-re-emit — so the gate
  * cannot silently degenerate into a plain distinct. */
class DedupWithinWatermarkSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.01"

  test("q329 streaming emissions replay from the pinned state rules") {
    import spark.implicits._
    val out = SparkEntry.queries("q329_stream_dedup_within_wm")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", expr("ts div 1000").as("tsu"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val (mn, mx) = (ev.map(_._3).min, ev.map(_._3).max)
    val (c1, c2) = (mn + (mx - mn) / 3, mn + (mx - mn) * 2 / 3)
    def bOf(t: Long) = if (t <= c1) 0 else if (t <= c2) 1 else 2
    val keyrows = ev.groupBy(e => (e._1, e._2, bOf(e._3)))
      .map { case ((u, t, b), rows) => (u, t, b, rows.map(_._3).min) }
      .toSeq
    val delay = 3600000000L
    def byB(b: Int) = keyrows.filter(_._3 == b)
    val e0 = byB(0).map(r => (r._1, r._2, r._4))
    val e0k = e0.map(r => (r._1, r._2)).toSet
    val e1 = byB(1).filter(r => !e0k((r._1, r._2)))
      .map(r => (r._1, r._2, r._4))
    val wm1 = (byB(0).map(_._4).max / 1000L) * 1000L - delay
    val alive = (e0 ++ e1).filter(_._3 + delay > wm1)
      .map(r => (r._1, r._2)).toSet
    val e2 = byB(2).filter(r => !alive((r._1, r._2)))
      .map(r => (r._1, r._2, r._4))
    val want = (e0 ++ e1 ++ e2).sortBy(identity)
    assert(out.sorted.toSeq == want, "q329 replay diverged")

    // all three state paths must fire at this scale
    assert(e0.nonEmpty, "no fresh emissions")
    val absorbed = byB(1).count(r => e0k((r._1, r._2)))
    assert(absorbed > 0, "no absorb-while-alive path exercised")
    val reEmitted = e2.count(r => e0k((r._1, r._2)))
    assert(reEmitted > 0, "no evict-then-re-emit path exercised")
  }
}
