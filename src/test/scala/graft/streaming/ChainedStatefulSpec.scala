package graft.streaming

import graft.{SparkEntry, SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Engine-internal cross-check for the q326 chained-stateful gate
  * (stream-stream interval join → tumbling windowed agg in ONE streaming
  * query). The gate is DuckDB-hash-gated; this spec pins the SEMANTIC
  * claim — the downstream agg flushes on the JOIN'S OUTPUT watermark
  * (global watermark − the join condition's 1 h event-time range), not on
  * the global watermark itself — with an independent in-engine batch
  * reformulation, so a Spark-side change in watermark propagation shows
  * up as a readable window diff rather than a hash flip.
  *
  * At sf0.01 the rule is DISCRIMINATING: the final batch window's end sits
  * between the two candidate cutoffs (naive global wm vs join-output wm),
  * so the spec also asserts that the naive rule would disagree — proving
  * the extra −1h in the gate's oracle is load-bearing, not decorative.
  */
class ChainedStatefulSpec extends SparkTestBase {

  /** Batch replay of join + window + append-flush under cutoff rule:
    * emit windows with end ≤ min(side maxima, ms-floored) − delay − extra. */
  private def batchWindows(dir: String, extraUs: Long): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts div 1000").as("tsu"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"tsu".as("ptsu"))
    val c = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_event"),
        $"tsu".as("ctsu"))
    val cutoff = math.min(
      (p.agg(max($"ptsu")).head.getLong(0) / 1000L) * 1000L,
      (c.agg(max($"ctsu")).head.getLong(0) / 1000L) * 1000L) -
      3600000000L - extraUs
    p.join(c, $"user_id" === $"c_user" &&
        $"ctsu" >= $"ptsu" - 3600000000L && $"ctsu" <= $"ptsu")
      .groupBy(($"ptsu" - pmod($"ptsu", lit(3600000000L)))
        .as("window_start_us"))
      .agg(count(lit(1)).as("n_pairs"), sum($"click_event").as("click_sum"))
      .filter($"window_start_us" + 3600000000L <= cutoff)
  }

  test("q326 streaming chained join→window == batch + join-output-watermark flush") {
    val dir = "/root/testdata/sf0.001"
    val stream = SparkEntry.queries("q326_stream_chained_stateful")(spark, dir)
    assert(stream.count() > 0)
    val batch = batchWindows(dir, extraUs = 3600000000L)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
      "streaming chained windows diverge from batch + propagation rule")
  }

  /** Batch replay of the q333 agg→agg chain under the undelayed-watermark
    * flush rule: hour windows with end ≤ floor_ms(max purchase ts) − 1h. */
  private def batchHours(dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select(expr("ts div 1000").as("tsu"))
    val wm = (e.agg(max($"tsu")).head.getLong(0) / 1000L) * 1000L -
      3600000000L
    e.withColumn("w5", $"tsu" - pmod($"tsu", lit(300000000L)))
      .groupBy($"w5").agg(count(lit(1)).as("n5"))
      .withColumn("window_start_us", $"w5" - pmod($"w5", lit(3600000000L)))
      .groupBy($"window_start_us")
      .agg(sum($"n5").as("n_purchases"), max($"n5").as("max_bucket"),
        count(lit(1)).as("n_buckets"))
      .filter($"window_start_us" + 3600000000L <= wm)
  }

  test("q333 streaming agg→agg == batch rollup + undelayed-watermark flush") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val stream = SparkEntry.queries("q333_stream_chained_aggs")(spark, dir)
        .localCheckpoint(true)
      assert(stream.count() > 0)
      val batch = batchHours(dir)
      assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty,
        s"chained agg diverges from batch + flush rule at $dir")
      // the flush rule must actually cut a tail at this scale (else the
      // gate degenerates to a plain rollup and tests nothing streaming)
      val unfiltered = {
        import spark.implicits._
        Tables.events(spark, dir).filter($"event_type" === "purchase")
          .select(expr("ts div 1000").as("tsu"))
          .select(($"tsu" - pmod($"tsu", lit(3600000000L)))
            .as("window_start_us")).distinct()
      }
      assert(unfiltered.count() > stream.count(),
        s"no tail window withheld at $dir — fixture no longer " +
          "exercises the flush boundary")
    }
  }

  test("q326 the join-interval subtraction is load-bearing at sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val stream = SparkEntry.queries("q326_stream_chained_stateful")(spark, dir)
      .localCheckpoint(true)
    val withRule = batchWindows(dir, extraUs = 3600000000L)
    val naive = batchWindows(dir, extraUs = 0L)
    assert(stream.exceptAll(withRule).isEmpty &&
      withRule.exceptAll(stream).isEmpty,
      "streaming diverges from the join-output-watermark rule at sf0.01")
    // the naive global-watermark rule must disagree here (one extra tail
    // window), or this dataset no longer discriminates the two rules and
    // the spec needs a new fixture scale
    assert(naive.exceptAll(stream).count() > 0,
      "fixture no longer discriminates join-output vs global watermark")
  }
}
