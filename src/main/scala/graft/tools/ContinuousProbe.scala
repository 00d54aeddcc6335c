package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Feasibility probe for Trigger.Continuous: which sinks/ops the
  * continuous engine actually accepts on this runtime, and whether a
  * bounded prefix can be read back deterministically.
  *
  * MEASURED RESULT (round 11): the ContinuousExecution engine starts
  * and commits epochs against the rate source (ProcessingTimeExecutor
  * ticks visible in the log for minutes), but the memory-sink
  * read-back path never surfaces the committed rows to a driver-side
  * `spark.table(...)` poll — the query cannot be driven to a bounded
  * deterministic state from a test harness. Trigger.Continuous is
  * therefore NOT oracle-gateable here; the gated trigger surface is
  * AvailableNow (the 11 file-replay gates) + ProcessingTime (q357),
  * which covers every mode a bounded correctness harness can pin. */
object ContinuousProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      val q = spark.readStream.format("rate")
        .option("rowsPerSecond", "2000")
        .load()
        .filter($"value" < 500)
        .select($"value")
        .writeStream.format("memory").queryName("cont_probe")
        .outputMode("append")
        .trigger(Trigger.Continuous("200 milliseconds"))
        .start()
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (spark.table("cont_probe").count() < 500 &&
        System.nanoTime() < deadline) Thread.sleep(100)
      val n = spark.table("cont_probe").count()
      q.stop()
      println(s"CONTINUOUS_OK rows=$n distinct=" +
        spark.table("cont_probe").distinct().count())
    } catch {
      case e: Throwable =>
        println(s"CONTINUOUS_FAIL ${e.getClass.getName}: ${e.getMessage}")
    }
    spark.stop()
  }
}
