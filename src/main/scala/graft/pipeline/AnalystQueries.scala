package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's consumer API: the ten distinct analyst queries of
  * sql/example_queries.sql (+ docs/use_cases.md:44-57), as named functions
  * over the gold / DQ tables (SURVEY §2.11).
  *
  * Q1's QUALIFY is rewritten as row_number + filter (OSS Spark's parser has
  * no QUALIFY — SURVEY §7.4). The "latest date" scalar subqueries become
  * `max(date)` semi-computed via a window-free cross join of a 1-row
  * aggregate — Catalyst plans the same tiny subquery job the SQL form gets.
  */
object AnalystQueries {

  private def latestDate(gold: DataFrame): Column =
    gold.agg(max(col("date"))).first().getDate(0) match { case d => lit(d) }

  /** Q1: latest snapshot per symbol (QUALIFY rewrite). */
  def latestSnapshot(gold: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("date").desc)
    gold.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("symbol"))
  }

  /** Q2: top absolute moves on the latest date. */
  def topMoves(gold: DataFrame, limit: Int = 20): DataFrame =
    gold.filter(col("date") === latestDate(gold))
      .orderBy(abs(col("return_1d")).desc, col("symbol"))
      .limit(limit)

  /** Q3: volatility regime scan on the latest date. */
  def volatilityScan(gold: DataFrame, limit: Int = 20): DataFrame =
    gold.filter(col("date") === latestDate(gold))
      .orderBy(col("vol_20d").desc_nulls_last, col("symbol"))
      .limit(limit)

  /** Q4: liquidity screen on the latest date. */
  def liquidityScreen(gold: DataFrame, limit: Int = 20): DataFrame =
    gold.filter(col("date") === latestDate(gold))
      .orderBy(col("avg_volume_20d").desc_nulls_last, col("symbol"))
      .limit(limit)

  /** Q5: single-symbol recent window. */
  def recentWindow(gold: DataFrame, symbol: String, days: Int = 60): DataFrame =
    gold.filter(col("symbol") === symbol)
      .orderBy(col("date").desc)
      .limit(days)

  /** Q6: large-move alerts on the latest date (|return| > threshold). */
  def largeMoveAlert(gold: DataFrame, threshold: Double = 0.02): DataFrame =
    gold.filter(col("date") === latestDate(gold) &&
        abs(col("return_1d")) > threshold)
      .orderBy(abs(col("return_1d")).desc, col("symbol"))

  /** Q7: volatility expansion — trailing-60-day self interval join, HAVING
    * vol > 1.5 * trailing avg. Equi key `symbol` carries the shuffle; the
    * date range is the residual predicate (SURVEY J1). Per-symbol fan-out
    * is bounded by history length; AQE skew-split covers hot symbols. */
  def volatilityExpansion(gold: DataFrame): DataFrame = {
    val g = gold.select(col("symbol"), col("date"), col("vol_20d")).as("g")
    val g2 = gold.select(col("symbol"), col("date"), col("vol_20d")).as("g2")
    g.join(g2,
        col("g.symbol") === col("g2.symbol") &&
        col("g2.date").between(date_sub(col("g.date"), 60), col("g.date")))
      .groupBy(col("g.symbol").as("symbol"), col("g.date").as("date"),
        col("g.vol_20d").as("vol_20d"))
      .agg(avg(col("g2.vol_20d")).as("avg_vol_60d"))
      .filter(col("vol_20d") > lit(1.5) * col("avg_vol_60d"))
      .orderBy(col("symbol"), col("date"))
  }

  /** Q8: cross-asset snapshot on a fixed date. */
  def crossAssetOn(gold: DataFrame, date: java.sql.Date): DataFrame =
    gold.filter(col("date") === lit(date)).orderBy(col("symbol"))

  /** Q9: completeness check — per-symbol coverage. */
  def completeness(gold: DataFrame): DataFrame =
    gold.groupBy(col("symbol"))
      .agg(min(col("date")).as("first_date"), max(col("date")).as("last_date"),
        count(lit(1)).as("n_days"))
      .orderBy(col("symbol"))

  /** Q10: DQ triage — failing checks of the latest run. */
  def dqTriage(dq: DataFrame): DataFrame = {
    val latestRun = dq.agg(max(col("run_ts"))).first().getTimestamp(0)
    dq.filter(col("run_ts") === lit(latestRun) && col("check_status") === "FAIL")
      .orderBy(col("layer"), col("check_name"), col("symbol"))
  }
}
