package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Randomized real-exec validation of q336's CHAINED flush rule:
  * `dropDuplicatesWithinWatermark` → Append-mode tumbling window in one
  * query. The reference model composes the two already-pinned rule sets:
  *   - dedup emissions per batch = DedupWithinWatermarkPropertySpec's
  *     replay (filter lags two batches, absorb regardless of expiry,
  *     no extension, inclusive end-of-batch eviction at wm(n−1));
  *   - the downstream agg sees the UNDELAYED watermark and the SAME
  *     lagged (through batch n−2) late filter as the dedup input — so no
  *     dedup emission is ever dropped late by the agg — and the final
  *     (AvailableNow trailing) flush emits exactly the windows with
  *     end ≤ wm(last batch).
  * Random fixtures here include batch-n emissions whose window end sits
  * BELOW wm(n−1) — the case that distinguishes the n−2 filter from an
  * n−1 one (the real exec keeps them; an n−1 model wrongly drops). */
class DedupThenAggPropertySpec extends SparkTestBase {

  private val DelayUs = 3600L * 1000000L
  private val Day = 86400L * 1000000L
  private val W = 1200L * 1000000L // 20-minute windows

  /** Per-batch dedup emissions + the watermark history (wm through each
    * batch) — the q329-pinned replay, emissions split by batch. */
  private def replay(batches: Seq[Seq[(String, Long)]])
      : (Seq[Seq[(String, Long)]], Vector[Long]) = {
    var wmHist = Vector.empty[Long]
    var state = Map.empty[String, Long]
    var maxSeen = Long.MinValue
    val perBatch = batches.zipWithIndex.map { case (batch, n) =>
      val filterWm = if (n >= 2) wmHist(n - 2) else Long.MinValue
      val evictWm = if (n >= 1) wmHist(n - 1) else Long.MinValue
      val live = batch.filter { case (_, t) => t > filterWm }
      val emitted = live.flatMap { case (k, t) =>
        if (!state.contains(k)) { state += k -> (t + DelayUs); Some((k, t)) }
        else None
      }
      live.foreach { case (_, t) => maxSeen = math.max(maxSeen, t) }
      state = state.filter { case (_, exp) => exp > evictWm }
      wmHist :+= (if (maxSeen == Long.MinValue) Long.MinValue
        else (maxSeen / 1000L) * 1000L - DelayUs)
      emitted
    }
    (perBatch, wmHist)
  }

  /** Chained model: accumulate per-window counts with the late-drop
    * rule, then flush everything with end ≤ wm(last). The agg's late
    * filter in batch n uses the SAME lagged watermark as the dedup's
    * input filter — through batch n−2, NOT n−1 (pinned here on a random
    * fixture where a batch-1 emission's window end sat below wm(0): the
    * real exec KEPT it) — and therefore can never fire downstream of the
    * dedup: any row passing the dedup filter has t > wm(n−2), so its
    * window end > wm(n−2) too. Kept explicit anyway so the rule is
    * written down. */
  private def chainModel(batches: Seq[Seq[(String, Long)]]): Set[(Long, Long)] = {
    val (perBatch, wmHist) = replay(batches)
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    perBatch.zipWithIndex.foreach { case (emitted, n) =>
      val filterWm = if (n >= 2) wmHist(n - 2) else Long.MinValue
      emitted.foreach { case (_, t) =>
        val ws = t - t % W
        if (ws + W > filterWm) counts(ws) = counts.getOrElse(ws, 0L) + 1L
      }
    }
    val wmLast = wmHist.last
    counts.toSeq.filter { case (ws, _) => ws + W <= wmLast }.toSet
  }

  test("random multi-batch fixtures: real chained execs == composed-rule model") {
    import spark.implicits._
    val rnd = new scala.util.Random(3360L)
    for (trial <- 1 to 8) {
      val nBatches = 2 + rnd.nextInt(3)
      val keys = ('A' to ('A' + 2 + rnd.nextInt(4)).toChar).map(_.toString)
      val batches0 = (0 until nBatches).map { _ =>
        keys.filter(_ => rnd.nextBoolean()).map { k =>
          (k, Day + rnd.nextInt(600) * 60L * 1000000L) // minute lattice, ≤10h
        }
      }.map(_.toSeq).toSeq
      val batches = batches0.map(b =>
        if (b.isEmpty) Seq(("__pad", Day - DelayUs)) else b)
      val dir = java.nio.file.Files
        .createTempDirectory(s"ddagg_prop_$trial").toString
      val staged = s"$dir/staged"; new java.io.File(staged).mkdirs()
      batches.zipWithIndex.foreach { case (b, i) =>
        b.toDF("k", "tsu").coalesce(1).write.mode(SaveMode.Overwrite)
          .parquet(s"$dir/f$i")
        val f = new java.io.File(s"$dir/f$i").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(staged, f"b$i%04d.parquet")
        java.nio.file.Files.copy(f.toPath, dst.toPath)
        assert(dst.setLastModified(1000000L * (i + 1)))
      }
      val schema = spark.read.parquet(staged).schema
      val sink = s"ddagg_prop_sink_$trial"
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$staged/*.parquet")
        .select($"k", timestamp_micros($"tsu").as("ets"))
        .withWatermark("ets", "1 hour")
        .dropDuplicatesWithinWatermark("k")
        .groupBy(window($"ets", "20 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table(sink)
        .select(unix_micros($"w.start"), $"n").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = chainModel(batches)
      assert(got == want,
        s"trial $trial diverged\nbatches=$batches\ngot=$got\nwant=$want")
    }
  }
}
