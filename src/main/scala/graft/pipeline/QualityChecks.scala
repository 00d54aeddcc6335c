package graft.pipeline

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** DQ layer: four checks persisted as rows (monitoring-as-data).
  *
  * Reference: notebooks/gold/04_data_quality_checks.py. Semantics kept:
  *  - thresholds GAP_DAYS=4, ABS_RETURN=0.10, STALE_DAYS=7 (04:15-17);
  *  - gap check: LAG(date) per symbol → DATEDIFF → only failures persisted
  *    (04:43-74; PASS rows computed then discarded — replicated);
  *  - jump check: |return_1d| > 0.10, status hardcoded 'FAIL' (04:77-92);
  *  - stale check: MAX(date) per symbol vs `today`, failures only
  *    (04:95-124) — `today` injectable (reference uses current_date());
  *  - row-count summary: one PASS row with all layer counts concatenated
  *    (04:127-143);
  *  - 4-way positional UNION ALL, appended to the checks table (04:147-156)
  *    with a single run_ts per run via injection (04:40, SURVEY §7.5).
  */
object QualityChecks {

  val GapDaysThreshold = 4
  val AbsReturnThreshold = 0.10
  val StaleDaysThreshold = 7

  private def row(runTs: Timestamp, layer: String, name: String) =
    Seq(lit(runTs).as("run_ts"), lit(layer).as("layer"), lit(name).as("check_name"))

  def gapCheck(silver: DataFrame, runTs: Timestamp,
               gapDays: Int = GapDaysThreshold): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("date"))
    silver
      .withColumn("prev_date", lag(col("date"), 1).over(w))
      .withColumn("gap_days", datediff(col("date"), col("prev_date")))
      .filter(col("gap_days") > gapDays)
      .select(row(runTs, "silver", "missing_trading_days") ++ Seq(
        col("symbol"),
        lit("FAIL").as("check_status"),
        col("gap_days").cast("double").as("metric_value"),
        lit(gapDays.toDouble).as("threshold"),
        concat(lit("gap of "), col("gap_days").cast("string"),
          lit(" days ending "), col("date").cast("string")).as("details")): _*)
  }

  def jumpCheck(gold: DataFrame, runTs: Timestamp,
                absReturn: Double = AbsReturnThreshold): DataFrame =
    gold
      .filter(abs(col("return_1d")) > absReturn)
      .select(row(runTs, "gold", "sudden_price_jump") ++ Seq(
        col("symbol"),
        lit("FAIL").as("check_status"),
        col("return_1d").cast("double").as("metric_value"),
        lit(absReturn).as("threshold"),
        concat(lit("return_1d="), col("return_1d").cast("string"),
          lit(" on "), col("date").cast("string")).as("details")): _*)

  def staleCheck(silver: DataFrame, runTs: Timestamp, today: Date,
                 staleDays: Int = StaleDaysThreshold): DataFrame =
    silver
      .groupBy(col("symbol"))
      .agg(max(col("date")).as("last_date"))
      .withColumn("days_stale", datediff(lit(today), col("last_date")))
      .filter(col("days_stale") > staleDays)
      .select(row(runTs, "silver", "stale_data") ++ Seq(
        col("symbol"),
        lit("FAIL").as("check_status"),
        col("days_stale").cast("double").as("metric_value"),
        lit(staleDays.toDouble).as("threshold"),
        concat(lit("last date "), col("last_date").cast("string"),
          lit(" is "), col("days_stale").cast("string"),
          lit(" days old")).as("details")): _*)

  def rowCountSummary(bronze: DataFrame, silver: DataFrame, gold: DataFrame,
                      runTs: Timestamp): DataFrame = {
    // Scalar-subquery-style counts packed into one summary row (04:139-141).
    val (nb, ns, ng) = (bronze.count(), silver.count(), gold.count())
    val spark = bronze.sparkSession
    import spark.implicits._
    Seq((nb, ns, ng)).toDF("nb", "ns", "ng")
      .select(row(runTs, "pipeline", "row_counts") ++ Seq(
        lit(null).cast("string").as("symbol"),
        lit("PASS").as("check_status"),
        col("ns").cast("double").as("metric_value"),
        lit(null).cast("double").as("threshold"),
        concat(lit("bronze="), col("nb").cast("string"),
          lit(" silver="), col("ns").cast("string"),
          lit(" gold="), col("ng").cast("string")).as("details")): _*)
  }

  def run(spark: SparkSession, catalog: Catalog,
          runTs: Timestamp = new Timestamp(System.currentTimeMillis()),
          today: Date = new Date(System.currentTimeMillis()),
          names: TableNames = TableNames(),
          thresholds: DqThresholds = DqThresholds()): DataFrame = {
    val bronze = catalog.read(names.bronze)
    val silver = catalog.read(names.silver)
    val gold = catalog.read(names.gold)
    val checks = gapCheck(silver, runTs, thresholds.gapDays)
      .unionAll(jumpCheck(gold, runTs, thresholds.absReturn))
      .unionAll(staleCheck(silver, runTs, today, thresholds.staleDays))
      .unionAll(rowCountSummary(bronze, silver, gold, runTs))
    catalog.append(checks, names.dq, Seq("layer"))
    catalog.read(names.dq)
  }
}
