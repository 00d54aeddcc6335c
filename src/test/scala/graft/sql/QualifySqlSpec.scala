package graft.sql

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The QUALIFY paste shim: the reference's literal analyst SQL must run
  * unmodified, and the rewrite must be token-safe and loud at its limits. */
class QualifySqlSpec extends SparkTestBase {

  private lazy val gold: DataFrame = {
    import spark.implicits._
    Seq(
      ("SPY", "2025-12-22", 100.0, Some(0.001), Some(0.010), Some(1000.0)),
      ("SPY", "2025-12-24", 112.5, Some(0.004), Some(0.090), Some(1100.0)),
      ("GLD", "2025-12-22", 50.0, Some(-0.002), Some(0.005), Some(500.0)),
      ("GLD", "2025-12-24", 51.0, Some(0.009), Some(0.006), Some(600.0)))
      .toDF("symbol", "ds", "close", "return_1d", "vol_20d", "avg_volume_20d")
      .withColumn("date", to_date(col("ds"))).drop("ds")
      .withColumn("computed_at", lit(Timestamp.valueOf("2026-01-02 00:00:00")))
  }

  test("the reference's Q1 text runs verbatim (sql/example_queries.sql:7-15)") {
    gold.createOrReplaceTempView("gold_market_features_daily")
    // pasted byte-for-byte from the reference file — the shim's whole point
    val referenceQ1 =
      """SELECT
        |  symbol,
        |  date,
        |  close,
        |  return_1d,
        |  vol_20d
        |FROM gold_market_features_daily
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY date DESC) = 1
        |ORDER BY symbol;""".stripMargin
    val viaShim = QualifySql.sql(spark, referenceQ1)
    assert(viaShim.columns.toSeq ==
      Seq("symbol", "date", "close", "return_1d", "vol_20d"))
    val expected = graft.pipeline.AnalystQueries.latestSnapshot(gold)
      .select("symbol", "date", "close", "return_1d", "vol_20d")
    assert(viaShim.collect().toSeq == expected.collect().toSeq)
  }

  test("the q04 gate shape through QUALIFY matches the DataFrame result") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet").createOrReplaceTempView("orders")
    val viaShim = QualifySql.sql(spark,
      """SELECT o_custkey, o_orderkey AS latest_orderkey,
        |  CAST(o_orderdate AS DATE) AS latest_orderdate,
        |  o_totalprice AS latest_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin)
    val expected = graft.SparkEntry.queries("q04_latest_per_key")(spark, dir)
    assert(viaShim.collect().toSeq == expected.collect().toSeq)
  }

  test("statements without a top-level QUALIFY pass through untouched") {
    val plain = "SELECT a, b FROM t WHERE x = 1 ORDER BY a"
    assert(QualifySql.rewrite(plain) eq plain)
    // QUALIFY in a string literal, a comment, or a subquery is not ours
    val tricky =
      """SELECT a, 'has QUALIFY inside' AS s -- QUALIFY in a comment
        |FROM (SELECT a FROM u QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1) t""".stripMargin
    assert(QualifySql.rewrite(tricky) eq tricky)
  }

  test("the rewrite keeps ORDER BY / LIMIT after the predicate") {
    val out = QualifySql.rewrite(
      "SELECT k, v FROM t QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) = 1 ORDER BY k LIMIT 5")
    assert(out.contains("WHERE __qualify ORDER BY k LIMIT 5"), out)
    assert(out.startsWith("SELECT k, v FROM (SELECT "), out)
  }

  test("unsupported shapes fail loudly instead of guessing") {
    intercept[IllegalArgumentException](QualifySql.rewrite(
      "SELECT * FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"))
    intercept[IllegalArgumentException](QualifySql.rewrite(
      "SELECT a + b FROM t QUALIFY ROW_NUMBER() OVER (ORDER BY a) = 1"))
  }
}
