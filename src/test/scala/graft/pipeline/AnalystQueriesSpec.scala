package graft.pipeline

import java.sql.{Date, Timestamp}
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ten analyst queries against a deterministic 2-symbol gold fixture. */
class AnalystQueriesSpec extends SparkTestBase {

  private lazy val gold: DataFrame = {
    import spark.implicits._
    val t = Timestamp.valueOf("2026-01-02 00:00:00")
    // (symbol, date, close, volume, return_1d, vol_20d, avg_volume_20d)
    val rows = Seq(
      ("SPY", "2025-12-22", 100.0, 1000L, Some(0.001), Some(0.010), Some(1000.0)),
      ("SPY", "2025-12-23", 112.0, 1100L, Some(0.120), Some(0.020), Some(1050.0)),
      ("SPY", "2025-12-24", 112.5, 1200L, Some(0.004), Some(0.090), Some(1100.0)),
      ("GLD", "2025-12-22", 50.0, 500L, Some(-0.002), Some(0.005), Some(500.0)),
      ("GLD", "2025-12-23", 50.5, 600L, Some(0.010), Some(0.006), Some(550.0)),
      ("GLD", "2025-12-24", 51.0, 700L, Some(0.009), Some(0.006), Some(600.0)))
    rows.toDF("symbol", "ds", "close", "volume", "return_1d", "vol_20d", "avg_volume_20d")
      .withColumn("date", to_date(col("ds"))).drop("ds")
      .withColumn("source", lit("test"))
      .withColumn("computed_at", lit(t))
  }

  test("Q1 latest snapshot: one row per symbol, max date") {
    val out = AnalystQueries.latestSnapshot(gold).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Date]("date") == Date.valueOf("2025-12-24")))
  }

  test("Q2/Q6: top moves and alerts use the latest date only") {
    val top = AnalystQueries.topMoves(gold).collect()
    assert(top.length == 2 && top.head.getAs[String]("symbol") == "GLD") // |0.009| > |0.004|
    val alerts = AnalystQueries.largeMoveAlert(gold, threshold = 0.005).collect()
    assert(alerts.map(_.getAs[String]("symbol")).toSeq == Seq("GLD"))
  }

  test("Q3/Q4: volatility and liquidity ranking on latest date") {
    assert(AnalystQueries.volatilityScan(gold).head.getAs[String]("symbol") == "SPY")
    assert(AnalystQueries.liquidityScreen(gold).head.getAs[String]("symbol") == "SPY")
  }

  test("Q5: single-symbol recent window is date-desc limited") {
    val out = AnalystQueries.recentWindow(gold, "SPY", days = 2).collect()
    assert(out.map(_.getAs[Date]("date").toString).toSeq ==
      Seq("2025-12-24", "2025-12-23"))
  }

  test("Q7: volatility expansion flags vol > 1.5x trailing average") {
    val out = AnalystQueries.volatilityExpansion(gold).collect()
    // SPY 12-24: vol .09 vs trailing avg (.01+.02+.09)/3 = .04 → 0.09 > 0.06 FAIL→flag
    assert(out.map(r => (r.getAs[String]("symbol"), r.getAs[Date]("date").toString)).toSet ==
      Set(("SPY", "2025-12-24")))
  }

  test("Q8/Q9: fixed-date snapshot and completeness") {
    assert(AnalystQueries.crossAssetOn(gold, Date.valueOf("2025-12-23")).count() == 2)
    val comp = AnalystQueries.completeness(gold).collect()
    assert(comp.length == 2 && comp.forall(_.getAs[Long]("n_days") == 3L))
  }

  test("Q10: DQ triage keeps only latest-run failures") {
    import spark.implicits._
    val dq = Seq(
      ("2026-01-01 00:00:00", "silver", "gap", "SPY", "FAIL"),
      ("2026-01-02 00:00:00", "silver", "gap", "SPY", "FAIL"),
      ("2026-01-02 00:00:00", "gold", "jump", "GLD", "PASS"))
      .toDF("ts", "layer", "check_name", "symbol", "check_status")
      .withColumn("run_ts", to_timestamp(col("ts"))).drop("ts")
    val out = AnalystQueries.dqTriage(dq).collect()
    assert(out.length == 1 &&
      out.head.getAs[Timestamp]("run_ts") == Timestamp.valueOf("2026-01-02 00:00:00"))
  }
}
