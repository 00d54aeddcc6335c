package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Empirical probe for the chained-stateful-operator gate (q326): runs
  * stream-stream join → tumbling window agg in ONE streaming query and
  * prints which windows the bounded AvailableNow replay actually emits,
  * so the gate's oracle boundary encodes the engine's real watermark
  * propagation rule instead of a guess.
  */
object ChainedStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
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
    def src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1000000")
      .parquet(streamPath)
      .select($"user_id", $"event_id", $"event_type",
        (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
          timestamp_micros(expr("ts div 1000"))
        else $"ts".cast("timestamp")).as("ets"))
    val purchases = src.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_event"), $"ets".as("pts"))
      .withWatermark("pts", "1 hour")
    val clicks = src.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"event_id".as("click_event"),
        $"ets".as("cts"))
      .withWatermark("cts", "1 hour")
    val sink = "probe326"
    val q = purchases.join(clicks,
        $"user_id" === $"c_user" &&
          $"cts" >= $"pts" - expr("INTERVAL 1 HOUR") && $"cts" <= $"pts")
      .groupBy(window($"pts", "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"), sum($"click_event").as("click_sum"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table(sink)
      .select(unix_micros($"w.start").as("ws"), unix_micros($"w.end").as("we"),
        $"n_pairs", $"click_sum")
      .orderBy($"ws")
    out.show(200, truncate = false)
    // batch reference: every window + the stream maxima, to locate the cut
    val ev = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts div 1000").as("tsu"))
    val p = ev.filter($"event_type" === "purchase")
    val c = ev.filter($"event_type" === "click")
    println("maxP_us=" + p.agg(max($"tsu")).collect()(0).getLong(0))
    println("maxC_us=" + c.agg(max($"tsu")).collect()(0).getLong(0))
    val joined = p.as("p").join(c.as("c"),
        $"p.user_id" === $"c.user_id" &&
          $"c.tsu" >= $"p.tsu" - 3600000000L && $"c.tsu" <= $"p.tsu")
      .select(($"p.tsu" - pmod($"p.tsu", lit(3600000000L))).as("ws"),
        $"c.event_id".as("click_event"))
      .groupBy($"ws").agg(count(lit(1)).as("n_pairs"),
        sum($"click_event").as("click_sum"))
      .orderBy($"ws")
    joined.show(200, truncate = false)
    spark.stop()
  }
}
