package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Empirical probe for the chained agg→agg gate (q333): 5-minute purchase
  * counts re-aggregated into 1-hour rollups in ONE streaming query
  * (window over window_time). Prints the emitted hour windows and the
  * batch reference, so the gate's oracle encodes the engine's actual
  * flush boundary for the SECOND stateful agg (candidates: hour end ≤
  * global wm — the agg operator propagates its input watermark — vs some
  * further delay). */
object ChainedAggProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val streamPath = {
      val f = new java.io.File(path)
      if (f.isDirectory) path
      else s"$dir/[${path.split('/').last.head}]${path.split('/').last.tail}"
    }
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1000000")
      .parquet(streamPath)
      .filter($"event_type" === "purchase")
      .select($"event_id",
        (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else $"ts".cast("timestamp")).as("ets"))
    val sink = "probe333"
    val q = src.withWatermark("ets", "1 hour")
      .groupBy(window($"ets", "5 minutes").as("w5"))
      .agg(count(lit(1)).as("n5"))
      .groupBy(window(window_time($"w5"), "10 minutes").as("w60"))
      .agg(sum($"n5").as("n"), max($"n5").as("max5"),
        count(lit(1)).as("n_buckets"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"batch ${p.batchId}: rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")}")
    }
    spark.table(sink)
      .select(unix_micros($"w60.start").as("ws"), $"n", $"max5", $"n_buckets")
      .orderBy($"ws".desc).show(6, truncate = false)
    val ev = graft.Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select(expr("ts div 1000").as("tsu"))
    println("max_us=" + ev.agg(max($"tsu")).head.getLong(0))
    val batch = ev
      .withColumn("w5", ($"tsu" - pmod($"tsu", lit(300000000L))))
      .groupBy($"w5").agg(count(lit(1)).as("n5"))
      .withColumn("ws", ($"w5" - pmod($"w5", lit(600000000L))))
      .groupBy($"ws").agg(sum($"n5").as("n"), max($"n5").as("max5"),
        count(lit(1)).as("n_buckets"))
      .orderBy($"ws".desc)
    batch.show(8, truncate = false)
    spark.stop()
  }
}
