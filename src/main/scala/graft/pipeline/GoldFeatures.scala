package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gold layer: daily market features over silver.
  *
  * Reference: notebooks/gold/03_aggregate_gold.py. Semantics kept exactly
  * (SURVEY §7.5's ramp-up traps):
  *  - return_1d = close / LAG(close) − 1 per symbol by date (03:44-49);
  *    first row per symbol → NULL;
  *  - vol_20d = STDDEV_SAMP(return_1d) over ROWS 19 PRECEDING..CURRENT
  *    (03:63-67): SAMPLE stddev (n−1), NULL until ≥2 non-null returns,
  *    computed over however many rows the ramp-up frame holds;
  *  - avg_volume_20d = AVG(CAST(volume AS DOUBLE)) over the same frame
  *    (03:69-73): NULL-skipping, so FX symbols (all-null volume) stay NULL
  *    rather than zero-filled;
  *  - computed_at constant within a batch (03:76) — injectable here;
  *  - full INSERT OVERWRITE per run (03:82-95).
  *
  * Plan shape: both framed aggs share one (symbol, date) sort, so Catalyst
  * collapses them into a single Window node — one shuffle + one sort for
  * the whole feature set.
  */
object GoldFeatures {

  def features(silver: DataFrame, computedAt: Timestamp): DataFrame = {
    val bySym = Window.partitionBy(col("symbol")).orderBy(col("date"))
    val frame20 = bySym.rowsBetween(-19, Window.currentRow)
    silver
      .withColumn("return_1d", col("close") / lag(col("close"), 1).over(bySym) - 1)
      .withColumn("vol_20d", stddev_samp(col("return_1d")).over(frame20))
      .withColumn("avg_volume_20d", avg(col("volume").cast("double")).over(frame20))
      .select(col("symbol"), col("date"), col("close"), col("volume"),
        col("return_1d"), col("vol_20d"), col("avg_volume_20d"),
        col("source"), lit(computedAt).as("computed_at"))
  }

  def run(spark: SparkSession, catalog: Catalog,
          computedAt: Timestamp = new Timestamp(System.currentTimeMillis()),
          names: TableNames = TableNames()): DataFrame = {
    val silver = catalog.read(names.silver)
    catalog.overwrite(features(silver, computedAt), names.gold, Seq("symbol"))
    catalog.read(names.gold)
  }
}
