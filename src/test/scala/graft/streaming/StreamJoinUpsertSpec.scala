package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import graft.pipeline.{Catalog, Schemas}
import graft.streaming.StreamingOps.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Remaining streaming shapes: watermarked stream-stream join and
  * foreachBatch upsert (streaming MERGE into the parquet catalog). */
class StreamJoinUpsertSpec extends SparkTestBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("stream-stream interval join pairs clicks with recent views per user") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]

    val c = clicks.toDF().select($"user_id", $"ts".as("click_ts"), $"value".as("click_v"))
      .withWatermark("click_ts", "10 minutes")
    val v = views.toDF().select($"user_id".as("v_user"), $"ts".as("view_ts"), $"value".as("view_v"))
      .withWatermark("view_ts", "10 minutes")

    // click joined to views within the preceding 5 minutes
    val joined = c.join(v,
      $"user_id" === $"v_user" &&
        $"view_ts" <= $"click_ts" &&
        $"view_ts" >= $"click_ts" - expr("INTERVAL 5 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append).start()
    try {
      views.addData(
        Event(1, ts("2026-01-01 00:00:00"), "view", 10.0),
        Event(1, ts("2026-01-01 00:20:00"), "view", 20.0),
        Event(2, ts("2026-01-01 00:00:30"), "view", 30.0))
      clicks.addData(
        Event(1, ts("2026-01-01 00:03:00"), "click", 1.0), // pairs with view@00:00
        Event(1, ts("2026-01-01 00:21:00"), "click", 2.0), // pairs with view@00:20
        Event(2, ts("2026-01-01 00:30:00"), "click", 3.0)) // no view within 5m
      q.processAllAvailable()
      val rows = spark.table("ssjoin")
        .select($"user_id", $"click_v", $"view_v").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sorted
      assert(rows.toSeq == Seq((1L, 1.0, 10.0), (1L, 2.0, 20.0)))
    } finally q.stop()
  }

  test("foreachBatch streams upserts into the catalog (streaming MERGE)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val wh = tmpDir("stream-merge")
    val catalog = new Catalog(spark, wh)
    val input = MemoryStream[(String, String, Double)]

    // AvailableNow snapshots offsets at start: data must exist beforehand
    input.addData(("SPY", "2026-01-02", 100.0), ("GLD", "2026-01-02", 50.0))
    val q = input.toDF().toDF("symbol", "ds", "close")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val typed = batch
          .withColumn("date", to_date(col("ds"))).drop("ds")
          .withColumn("open", col("close")).withColumn("high", col("close"))
          .withColumn("low", col("close"))
          .withColumn("volume", lit(null).cast("long"))
          .withColumn("source", lit("stream"))
          .withColumn("ingested_at", lit(Timestamp.valueOf("2026-01-02 00:00:00")))
          .withColumn("input_file", lit(s"batch-$batchId"))
          .select(Schemas.bronze.fieldNames.map(col): _*)
        catalog.upsert(typed, Schemas.tables.bronze,
          keys = Seq("symbol", "date"), partitionBy = Seq("symbol"))
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(catalog.read(Schemas.tables.bronze).count() == 2)

    // second stream run (fresh source — a reused uncheckpointed MemoryStream
    // would replay run 1's data) updates one key, inserts another
    val input2 = MemoryStream[(String, String, Double)]
    input2.addData(("SPY", "2026-01-02", 999.0), ("SPY", "2026-01-03", 101.0))
    val q2 = input2.toDF().toDF("symbol", "ds", "close")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val typed = batch
          .withColumn("date", to_date(col("ds"))).drop("ds")
          .withColumn("open", col("close")).withColumn("high", col("close"))
          .withColumn("low", col("close"))
          .withColumn("volume", lit(null).cast("long"))
          .withColumn("source", lit("stream"))
          .withColumn("ingested_at", lit(Timestamp.valueOf("2026-01-03 00:00:00")))
          .withColumn("input_file", lit(s"batch2-$batchId"))
          .select(Schemas.bronze.fieldNames.map(col): _*)
        catalog.upsert(typed, Schemas.tables.bronze,
          keys = Seq("symbol", "date"), partitionBy = Seq("symbol"))
      }
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()

    val out = catalog.read(Schemas.tables.bronze)
    assert(out.count() == 3)
    val updated = out.filter(col("symbol") === "SPY" &&
      col("date") === java.sql.Date.valueOf("2026-01-02")).collect()
    assert(updated.length == 1 && updated.head.getAs[Double]("close") == 999.0)
  }
}
