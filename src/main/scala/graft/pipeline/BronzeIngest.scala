package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze layer: raw OHLCV CSV → typed, deduplicated, provenance-stamped
  * rows, upserted idempotently on (symbol, date).
  *
  * Reference: notebooks/bronze/01_ingest_bronze.py. Semantics kept exactly:
  *  - directory glob of `*.csv` with header + schema inference, then
  *    explicit casts ("infer, then cast", 01:23-27,40-53);
  *  - symbol extracted from the filename via `/([^/]+)\.csv$` group 1
  *    (01:33-36); file provenance via input_file_name() (01:28);
  *  - FX files carry no Volume column → typed-null volume (01:49-53), a
  *    schema-dependent host-language branch (SURVEY P21);
  *  - rows with null symbol/date/close dropped (01:64-68);
  *  - within-batch dropDuplicates on (symbol,date) — arbitrary survivor by
  *    contract (01:63-68, SURVEY D1);
  *  - MERGE upsert on (symbol,date): re-running the same batch is a no-op
  *    (01:93-107; emulation per SURVEY §7.3).
  *
  * `ingestedAt` is injectable for deterministic tests (the reference bakes
  * current_timestamp() in, SURVEY §7.5).
  */
object BronzeIngest {

  def readCsvDir(spark: SparkSession, csvDir: String, source: String,
                 ingestedAt: Timestamp): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(s"$csvDir/*.csv")

    val withVolume =
      if (raw.columns.contains("Volume")) raw.withColumn("volume", col("Volume").cast(LongType))
      else raw.withColumn("volume", lit(null).cast(LongType))

    withVolume
      .withColumn("input_file", input_file_name())
      .withColumn("symbol", regexp_extract(col("input_file"), "/([^/]+)\\.csv$", 1))
      .select(
        col("symbol"),
        to_date(col("Date")).as("date"),
        col("Open").cast(DoubleType).as("open"),
        col("High").cast(DoubleType).as("high"),
        col("Low").cast(DoubleType).as("low"),
        col("Close").cast(DoubleType).as("close"),
        col("volume"),
        lit(source).as("source"),
        lit(ingestedAt).as("ingested_at"),
        col("input_file"))
      .filter(col("symbol").isNotNull && col("symbol") =!= "" &&
        col("date").isNotNull && col("close").isNotNull)
      .dropDuplicates("symbol", "date")
  }

  /** Ingest a CSV batch into bronze_prices. Idempotent: the upsert key is
    * (symbol, date), incoming wins. A non-empty `symbols` whitelist and
    * start/end dates (reference config.yaml `data:`) bound the batch at
    * the edge — before the upsert touches any partition. */
  def run(spark: SparkSession, catalog: Catalog, csvDir: String,
          source: String = "stooq",
          ingestedAt: Timestamp = new Timestamp(System.currentTimeMillis()),
          names: TableNames = TableNames(),
          symbols: Seq[String] = Nil,
          startDate: Option[java.sql.Date] = None,
          endDate: Option[java.sql.Date] = None): DataFrame = {
    val all = readCsvDir(spark, csvDir, source, ingestedAt)
    val bySymbol =
      if (symbols.isEmpty) all else all.filter(col("symbol").isin(symbols: _*))
    val incoming = bySymbol
      .filter(startDate.map(d => col("date") >= lit(d)).getOrElse(lit(true)))
      .filter(endDate.map(d => col("date") <= lit(d)).getOrElse(lit(true)))
    catalog.upsert(incoming, names.bronze,
      keys = Seq("symbol", "date"), partitionBy = Seq("symbol"))
    catalog.read(names.bronze)
  }
}
