package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Empirical probe for dropDuplicatesWithinWatermark's micro-batch
  * semantics (feeds the q329 oracle). Findings from the three earlier
  * runs (all refit against the trace):
  *  - FileStreamSource orders same-listing files by MODIFICATION TIME —
  *    mtimes must be set explicitly or the batch order is arbitrary;
  *  - the input late-filter drops ts <= wm_lag where wm_lag for batch n
  *    is the watermark computed from data through batch n-2 (one batch
  *    BEHIND the tracker value the progress object reports for n);
  *  - state eviction at the end of batch n uses the un-lagged tracker
  *    (max event time through batch n-1, ms-floored, minus delay).
  * This run discriminates whether an ABSORBED duplicate extends the
  * key's expiry (emitted-A row set {0,160} => no extension / first-event
  * expiry; {0,165} => extension to max seen + delay). R@70 double-checks
  * the filter lag level (dropped => filter is wm through b0). */
object DedupWithinWmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("ddww_probe_").toString
    def ts(min: Long) = 86400L * 1000000L + min * 60L * 1000000L
    // X sits EXACTLY on the eviction boundary: expiry = 20m + 1h = +80m
    // == wm1 (max b0 = +140m, minus 1h). X re-emitting at +165 pins
    // eviction as `expiry <= wm`; X absorbed pins strict `<`.
    val batches = Seq(
      Seq(("A", ts(0)), ("A", ts(50)), ("X", ts(20)), ("P", ts(140))),
      Seq(("Q", ts(200))),
      Seq(("A", ts(160)), ("X", ts(165)), ("R", ts(70))),
      Seq(("A", ts(170))))
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("k", "tsu").coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$dir/f${i + 1}")
    }
    val staged = s"$dir/staged"; new java.io.File(staged).mkdirs()
    (1 to batches.length).foreach { i =>
      val f = new java.io.File(s"$dir/f$i").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(staged, f"$i%04d.parquet")
      java.nio.file.Files.copy(f.toPath, dst.toPath)
      // FileStreamSource orders by mtime: force chronological batches
      dst.setLastModified(1000000L * i)
    }

    val schema = spark.read.parquet(staged).schema
    val sink = "ddww_probe"
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged)
      .select($"k", timestamp_micros($"tsu").as("ets"))
      .withWatermark("ets", "1 hour")
      .dropDuplicatesWithinWatermark("k")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"batch ${p.batchId}: rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    spark.table(sink)
      .select($"k", (unix_micros($"ets") / 60000000L - 1440L).as("min"))
      .orderBy($"k", $"min").show(50, truncate = false)
  }
}
