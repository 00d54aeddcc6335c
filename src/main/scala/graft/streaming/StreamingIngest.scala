package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Streaming bronze ingestion: the file-source dual of
  * pipeline.BronzeIngest, consuming the checkpoint directory the reference
  * declares but never uses (config.yaml:17, SURVEY §2.10).
  *
  * Each newly arriving CSV in `csvDir` flows through the same
  * type/provenance contract as the batch path (explicit schema here — a
  * streaming source cannot infer) and appends to a parquet table
  * partitioned by symbol. Exactly-once: the file source tracks consumed
  * files in the checkpoint, so restarts neither skip nor double-ingest —
  * the streaming analog of the batch MERGE idempotency.
  */
object StreamingIngest {

  /** Raw Stooq-style CSV schema (the with-Volume variant; FX files without
    * a Volume column read as null — permissive mode). */
  val csvSchema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("Open", DoubleType),
    StructField("High", DoubleType),
    StructField("Low", DoubleType),
    StructField("Close", DoubleType),
    StructField("Volume", LongType)))

  def stream(spark: SparkSession, csvDir: String, source: String): DataFrame =
    spark.readStream
      .schema(csvSchema)
      .option("header", "true")
      .csv(s"$csvDir/*.csv")
      .withColumn("input_file", input_file_name())
      .withColumn("symbol", regexp_extract(col("input_file"), "/([^/]+)\\.csv$", 1))
      .select(
        col("symbol"),
        to_date(col("Date")).as("date"),
        col("Open").as("open"), col("High").as("high"),
        col("Low").as("low"), col("Close").as("close"),
        col("Volume").as("volume"),
        lit(source).as("source"),
        current_timestamp().as("ingested_at"),
        col("input_file"))
      .filter(col("symbol").isNotNull && col("symbol") =!= "" &&
        col("date").isNotNull && col("close").isNotNull)

  /** Start (or catch up) the ingest. AvailableNow processes everything
    * present and stops — the scheduled-batch pattern with streaming
    * bookkeeping. */
  def start(spark: SparkSession, csvDir: String, outDir: String,
            checkpointDir: String, source: String = "stooq"): StreamingQuery =
    stream(spark, csvDir, source).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("symbol")
      .trigger(Trigger.AvailableNow())
      .start()
}
