package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Randomized validation of the q329 oracle's probe-pinned state rules,
  * run through the REAL StreamingDeduplicateWithinWatermark exec: for
  * random multi-batch file fixtures (one row per key per batch — the
  * gate's staging invariant, since within-batch arrival order is not a
  * stable contract), the streaming emissions must equal the plain-Scala
  * replay of the pinned rules:
  *   filter(n) = watermark-through-batch(n−2), drop ts ≤ filter;
  *   a state hit absorbs regardless of expiry;
  *   expiry = emitted row's event time + delay (no extension);
  *   end-of-batch(n) eviction with watermark-through-batch(n−1),
  *   inclusive; watermark = ms-floored max SEEN (post-filter) ts − delay.
  * Eight random fixtures per run — slower than a unit test but this is
  * the evidence standing behind a hash-gated oracle whose semantics were
  * inferred from four probes. */
class DedupWithinWatermarkPropertySpec extends SparkTestBase {

  private val DelayUs = 3600L * 1000000L
  private val Day = 86400L * 1000000L

  private def replay(batches: Seq[Seq[(String, Long)]]): Set[(String, Long)] = {
    var wmHist = Vector.empty[Long] // wm after each batch (through that batch)
    var state = Map.empty[String, Long] // key -> expiry
    var emitted = Set.empty[(String, Long)]
    var maxSeen = Long.MinValue
    for ((batch, n) <- batches.zipWithIndex) {
      val filterWm = if (n >= 2) wmHist(n - 2) else Long.MinValue
      val evictWm = if (n >= 1) wmHist(n - 1) else Long.MinValue
      val live = batch.filter { case (_, t) => t > filterWm }
      live.foreach { case (k, t) =>
        if (!state.contains(k)) { state += k -> (t + DelayUs); emitted += ((k, t)) }
      }
      live.foreach { case (_, t) => maxSeen = math.max(maxSeen, t) }
      state = state.filter { case (_, exp) => exp > evictWm }
      wmHist :+= (if (maxSeen == Long.MinValue) Long.MinValue
        else (maxSeen / 1000L) * 1000L - DelayUs)
    }
    emitted
  }

  test("random multi-batch fixtures: real exec == pinned-rule replay") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 8) {
      val nBatches = 2 + rnd.nextInt(3)
      val keys = ('A' to ('A' + 2 + rnd.nextInt(4)).toChar).map(_.toString)
      val batches = (0 until nBatches).map { _ =>
        keys.filter(_ => rnd.nextBoolean()).map { k =>
          (k, Day + rnd.nextInt(600) * 60L * 1000000L) // minute lattice, ≤10h
        }
      }.map(_.toSeq).toSeq
      if (batches.forall(_.isEmpty)) () // degenerate; skip silently
      else {
        val dir = java.nio.file.Files
          .createTempDirectory(s"ddww_prop_$trial").toString
        val staged = s"$dir/staged"; new java.io.File(staged).mkdirs()
        batches.zipWithIndex.foreach { case (b, i) =>
          val rows = if (b.isEmpty) Seq(("__pad", Day - DelayUs)) else b
          rows.toDF("k", "tsu").coalesce(1).write.mode(SaveMode.Overwrite)
            .parquet(s"$dir/f$i")
          val f = new java.io.File(s"$dir/f$i").listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dst = new java.io.File(staged, f"b$i%04d.parquet")
          java.nio.file.Files.copy(f.toPath, dst.toPath)
          dst.setLastModified(1000000L * (i + 1))
        }
        val padded = batches.map(b =>
          if (b.isEmpty) Seq(("__pad", Day - DelayUs)) else b)
        val schema = spark.read.parquet(staged).schema
        val sink = s"ddww_prop_sink_$trial"
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$staged/*.parquet")
          .select($"k", timestamp_micros($"tsu").as("ets"))
          .withWatermark("ets", "1 hour")
          .dropDuplicatesWithinWatermark("k")
          .writeStream.format("memory").queryName(sink)
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val got = spark.table(sink)
          .select($"k", unix_micros($"ets")).collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        val want = replay(padded)
        assert(got == want,
          s"trial $trial diverged\nbatches=$padded\ngot=$got\nwant=$want")
      }
    }
  }
}
