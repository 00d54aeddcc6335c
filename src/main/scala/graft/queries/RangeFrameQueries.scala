package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Value-RANGE window frames — the complement of q06's ROWS frames: the
  * frame is every row whose ORDER BY value lies within a numeric distance
  * of the current row's, independent of row count (the right semantics for
  * irregular time series; ROWS frames break on gaps).
  */
object RangeFrameQueries extends QueryModule {

  /** q56: per-user running aggregates over a value-range frame on the
    * event time — all events within the trailing 10 minutes (in µs),
    * however many there are — plus percent_rank and nth_value breadth. */
  private def q56(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tenMinUs = 600L * 1000000L
    val order = Window.partitionBy($"user_id").orderBy($"tsu")
    val range = order.rangeBetween(-tenMinUs, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("tsu", expr("ts div 1000"))
      .select($"user_id", $"event_id", $"tsu", $"value",
        count(lit(1)).over(range).as("n_10m"),
        // decimal sum: moving-frame aggregation orders differ across
        // engines (segment trees), so the sum must be exact, not rounded
        sum($"value".cast("decimal(18,2)")).over(range)
          .cast("double").as("sum_10m"),
        round(percent_rank().over(order), 6).as("pr"),
        nth_value($"value", 2).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("second_value"))
      .orderBy($"user_id", $"event_id")
  }
  private val q56Sql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu, value FROM events)
      |SELECT user_id, event_id, tsu, value,
      |  count(*) OVER r AS n_10m,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER r AS DOUBLE) AS sum_10m,
      |  round(percent_rank() OVER o, 6) AS pr,
      |  nth_value(value, 2) OVER (PARTITION BY user_id ORDER BY tsu
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_value
      |FROM e
      |WINDOW o AS (PARTITION BY user_id ORDER BY tsu),
      |  r AS (PARTITION BY user_id ORDER BY tsu
      |        RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  override def queries: Seq[QueryDef] = Seq(
    QueryDef("q56_range_frames", q56, Some(q56Sql)),
  )
}
