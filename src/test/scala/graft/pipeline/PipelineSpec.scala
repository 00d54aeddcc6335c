package graft.pipeline

import java.sql.{Date, Timestamp}
import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** End-to-end medallion pipeline behavior on the FIXTURES.md fixtures:
  * CSV ingestion (equity + FX variants), MERGE idempotency, silver reject
  * precedence, gold window ramp-up, and the DQ fixtures.
  */
class PipelineSpec extends SparkTestBase {

  private def writeCsvs(dir: String): Unit = {
    def w(name: String, content: String): Unit = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.writeString(p, content.stripMargin.trim + "\n")
    }
    // Equity variant with Volume; includes an 8-calendar-day gap
    // (12-23 → 12-31) and a >10% jump (100 → 112) per FIXTURES §4.
    w("SPY.csv",
      """Date,Open,High,Low,Close,Volume
        |2025-12-18,99.5,100.5,99.0,100.0,41253900
        |2025-12-19,100.1,113.0,100.0,112.0,38821400
        |2025-12-22,112.2,112.9,111.5,112.5,35000000
        |2025-12-23,112.6,113.1,112.0,112.8,36000000
        |2025-12-31,113.0,113.5,112.5,113.2,37000000""")
    // FX variant: no Volume column.
    w("EURUSD.csv",
      """Date,Open,High,Low,Close
        |2025-12-22,1.0841,1.0877,1.0832,1.0869
        |2025-12-23,1.0869,1.0901,1.0855,1.0893
        |2025-12-31,1.0893,1.0921,1.0874,1.0911""")
  }

  private val t0 = Timestamp.valueOf("2026-01-02 00:00:00")
  private val today = Date.valueOf("2026-01-09") // > 7 days after 2025-12-31

  test("pipeline end-to-end: counts, schemas, idempotent bronze re-ingest") {
    val csvDir = tmpDir("graft-csv")
    val wh = tmpDir("graft-wh")
    writeCsvs(csvDir)

    val r1 = PipelineRunner.run(spark, wh, csvDir, now = t0, today = today)
    assert(r1.bronzeRows == 8) // 5 SPY + 3 EURUSD
    assert(r1.silverRows == 8)
    assert(r1.rejectedRows == 0)
    assert(r1.goldRows == 8)

    // Re-ingest the same batch: bronze unchanged (MERGE on (symbol,date)).
    val r2 = PipelineRunner.run(spark, wh, csvDir,
      now = Timestamp.valueOf("2026-01-03 00:00:00"), today = today)
    assert(r2.bronzeRows == 8)
    assert(r2.silverRows == 8)

    val catalog = new Catalog(spark, wh)
    val bronze = catalog.read(Schemas.tables.bronze)
    assert(bronze.columns.toSet == Schemas.bronze.fieldNames.toSet)
    // symbol came from the filename; FX volume is typed-null
    assert(bronze.filter(col("symbol") === "EURUSD").count() == 3)
    assert(bronze.filter(col("symbol") === "EURUSD" && col("volume").isNotNull).count() == 0)
    assert(bronze.filter(col("input_file").contains("SPY.csv")).count() == 5)
  }

  test("gold features: LAG return, ramp-up NULLs, FX null avg_volume") {
    val csvDir = tmpDir("graft-csv2")
    val wh = tmpDir("graft-wh2")
    writeCsvs(csvDir)
    PipelineRunner.run(spark, wh, csvDir, now = t0, today = today)
    val gold = new Catalog(spark, wh).read(Schemas.tables.gold)
      .filter(col("symbol") === "SPY").orderBy("date").collect()

    assert(gold(0).isNullAt(gold(0).fieldIndex("return_1d"))) // first row: LAG null
    val r1 = gold(1).getAs[Double]("return_1d")
    assert(math.abs(r1 - 0.12) < 1e-9) // 100 -> 112
    assert(gold(0).isNullAt(gold(0).fieldIndex("vol_20d"))) // 0 returns
    assert(gold(1).isNullAt(gold(1).fieldIndex("vol_20d"))) // 1 return: stddev_samp needs 2
    assert(!gold(2).isNullAt(gold(2).fieldIndex("vol_20d"))) // 2 returns

    // ramp-up values from first principles (SURVEY §7.5: the ramp-up
    // region must match exactly): closes 100, 112, 112.5 →
    // returns r2=0.12, r3=112.5/112-1; vol on row 3 = stddev_samp(r2, r3)
    val r3 = 112.5 / 112.0 - 1.0
    val mean = (0.12 + r3) / 2.0
    val expectedVol = math.sqrt(
      (math.pow(0.12 - mean, 2) + math.pow(r3 - mean, 2)) / 1.0) // n-1 = 1
    assert(math.abs(gold(2).getAs[Double]("vol_20d") - expectedVol) < 1e-12)
    assert(math.abs(gold(2).getAs[Double]("return_1d") - r3) < 1e-12)

    // avg_volume ramp-up: row 1 = its own volume; row 3 = mean of first 3
    assert(gold(0).getAs[Double]("avg_volume_20d") == 41253900.0)
    assert(math.abs(gold(2).getAs[Double]("avg_volume_20d") -
      (41253900.0 + 38821400.0 + 35000000.0) / 3.0) < 1e-6)

    val fx = new Catalog(spark, wh).read(Schemas.tables.gold)
      .filter(col("symbol") === "EURUSD")
    assert(fx.filter(col("avg_volume_20d").isNotNull).count() == 0) // null-skipping, not zero-fill
  }

  test("DQ checks: gap FAIL with metric 8.0, jump FAIL, stale FAIL, counts PASS") {
    val csvDir = tmpDir("graft-csv3")
    val wh = tmpDir("graft-wh3")
    writeCsvs(csvDir)
    PipelineRunner.run(spark, wh, csvDir, now = t0, today = today)
    val dq = new Catalog(spark, wh).read(Schemas.tables.dq)

    val gaps = dq.filter(col("check_name") === "missing_trading_days").collect()
    assert(gaps.length == 2) // SPY and EURUSD both have the 12-23 → 12-31 gap
    assert(gaps.forall(_.getAs[String]("check_status") == "FAIL"))
    assert(gaps.forall(_.getAs[Double]("metric_value") == 8.0))

    val jumps = dq.filter(col("check_name") === "sudden_price_jump").collect()
    assert(jumps.map(_.getAs[String]("symbol")).toSet == Set("SPY"))
    assert(math.abs(jumps.head.getAs[Double]("metric_value") - 0.12) < 1e-9)

    val stale = dq.filter(col("check_name") === "stale_data")
    assert(stale.count() == 2) // both symbols end 2025-12-31, today 2026-01-09

    val counts = dq.filter(col("check_name") === "row_counts").collect()
    assert(counts.length == 1 && counts.head.getAs[String]("check_status") == "PASS")
    assert(counts.head.getAs[String]("details") == "bronze=8 silver=8 gold=8")
  }

  test("config-driven run: symbols, date bounds, table names, DQ thresholds from file") {
    val csvDir = tmpDir("graft-csv5")
    val wh = tmpDir("graft-wh5")
    writeCsvs(csvDir)
    val cfgPath = java.nio.file.Paths.get(tmpDir("graft-cfg"), "config.yaml")
    java.nio.file.Files.writeString(cfgPath,
      s"""project:
         |  name: graft-test
         |  timezone: UTC
         |
         |data:
         |  symbols:
         |    - SPY
         |  start_date: "2025-12-19"   # drops SPY's first row
         |  end_date: null             # open-ended
         |  source: "stooq"
         |
         |paths:
         |  raw_input_dir: "$csvDir"
         |  checkpoints_dir: "$wh/checkpoints"
         |
         |tables:
         |  bronze_prices: "bronze_px"
         |  silver_prices_daily: "silver_px"
         |  gold_market_features_daily: "gold_feat"
         |  data_quality_checks: "dq_log"
         |
         |quality:
         |  gap_days: 10   # wider than the fixture's 8-day gap
         |  abs_return: 0.10
         |  stale_days: 7
         |""".stripMargin)

    val cfg = PipelineConfig.load(cfgPath.toString)
    assert(cfg.projectName == "graft-test")
    assert(cfg.symbols == Seq("SPY"))
    assert(cfg.startDate.contains(Date.valueOf("2025-12-19")) && cfg.endDate.isEmpty)
    assert(cfg.rawInputDir == csvDir)
    assert(cfg.tables.bronze == "bronze_px" && cfg.tables.dq == "dq_log")
    assert(cfg.thresholds.gapDays == 10)

    val r = PipelineRunner.runConfigured(spark, wh, cfg, now = t0, today = today)
    assert(r.bronzeRows == 4) // EURUSD filtered out; SPY 12-18 row date-bounded
    assert(r.goldRows == 4)

    // custom physical names on disk; defaults absent
    assert(new java.io.File(s"$wh/bronze_px").exists())
    assert(!new java.io.File(s"$wh/bronze_prices").exists())

    val dq = new Catalog(spark, wh, cfg.tables).read("dq_log")
    // gap threshold 10 > the 8-day fixture gap: no gap FAILs at all
    assert(dq.filter(col("check_name") === "missing_trading_days").count() == 0)
    // the 12-18→12-19 jump's base row was date-bounded away: no jump rows
    assert(dq.filter(col("check_name") === "sudden_price_jump").count() == 0)
    // threshold column reflects the configured value on the stale check
    val stale = dq.filter(col("check_name") === "stale_data").collect()
    assert(stale.nonEmpty && stale.forall(_.getAs[Double]("threshold") == 7.0))
  }

  test("DQ append accumulates across runs with distinct run_ts") {
    val csvDir = tmpDir("graft-csv4")
    val wh = tmpDir("graft-wh4")
    writeCsvs(csvDir)
    PipelineRunner.run(spark, wh, csvDir, now = t0, today = today)
    PipelineRunner.run(spark, wh, csvDir,
      now = Timestamp.valueOf("2026-01-03 00:00:00"), today = today)
    val dq = new Catalog(spark, wh).read(Schemas.tables.dq)
    assert(dq.select("run_ts").distinct().count() == 2)
  }
}
