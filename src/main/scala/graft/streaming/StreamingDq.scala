package graft.streaming

import java.sql.{Date, Timestamp}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Streaming duals of the batch DQ checks (pipeline.QualityChecks): the
  * gap and stale checks as stateful streams emitting the SAME
  * `data_quality_checks` rows the batch checks materialize, so one
  * monitoring table serves both execution modes (the reference reserves a
  * checkpoints dir its batch notebooks never consume — SURVEY §7.6's last
  * unbuilt row).
  *
  * Scale shapes: per-symbol state is one epoch-day long (constant);
  * staleness detection is an event-time TIMEOUT — the stream does not
  * poll symbols, the watermark passing a symbol's staleness horizon is
  * what fires the check, so a quiet symbol costs nothing until the moment
  * it is actually stale. The jump check needs no stateful dual (it is a
  * stateless per-row predicate — `routeBySplit`-style projection), and
  * the row-count summary is a batch-scoped snapshot by definition.
  */
object StreamingDq {

  final case class PriceRow(symbol: String, date: Date)
  private[streaming] final case class PriceEvent(symbol: String, date: Date, ts: Timestamp)

  /** Mirrors Schemas.dataQualityChecks field-for-field. */
  final case class CheckRow(
      run_ts: Timestamp, layer: String, check_name: String, symbol: String,
      check_status: String, metric_value: Double, threshold: Double, details: String)

  /** Per-symbol state: last trading date seen, as epoch days (tz-free). */
  final case class LastDate(epochDay: Long)

  private val DayMs = 86400000L

  /** Streaming gap check: per-symbol state is the last date seen; a row
    * arriving more than `gapDays` after it emits the same FAIL row batch
    * `QualityChecks.gapCheck` computes with LAG. Rows are sorted by date
    * within each micro-batch; for an in-date-order replay the output is
    * row-identical to the batch check (the parity spec asserts this). A
    * row older than the current state is measured against nothing and
    * does not regress the state — the streaming approximation for
    * out-of-order arrival. */
  def gapCheckStream(rows: Dataset[PriceRow], runTs: Timestamp,
                     gapDays: Int = graft.pipeline.QualityChecks.GapDaysThreshold): Dataset[CheckRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.symbol)
      .flatMapGroupsWithState[LastDate, CheckRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sym: String, it: Iterator[PriceRow], state: GroupState[LastDate]) =>
          val sorted = it.toArray.sortBy(_.date.toLocalDate.toEpochDay)
          var last = state.getOption.map(_.epochDay)
          val out = Seq.newBuilder[CheckRow]
          sorted.foreach { r =>
            val d = r.date.toLocalDate.toEpochDay
            last.foreach { p =>
              val gap = d - p
              if (gap > gapDays)
                out += CheckRow(runTs, "silver", "missing_trading_days", sym, "FAIL",
                  gap.toDouble, gapDays.toDouble,
                  s"gap of $gap days ending ${r.date}")
            }
            if (last.forall(_ < d)) last = Some(d)
          }
          last.foreach(d => state.update(LastDate(d)))
          out.result().iterator
      }
  }

  /** Streaming stale check: state keeps each symbol's max date; an
    * event-time timeout set at `last + staleDays + 1` days fires exactly
    * when the watermark (the stream's "today") crosses the batch check's
    * FAIL condition `datediff(today, last) > staleDays`, emitting the
    * identical row. Feeding a current-date probe row advances the
    * watermark to "today", after which the next micro-batch fires every
    * due timeout — the replay-parity recipe the spec uses. */
  def staleCheckStream(rows: Dataset[PriceRow], runTs: Timestamp,
                       staleDays: Int = graft.pipeline.QualityChecks.StaleDaysThreshold): Dataset[CheckRow] = {
    import rows.sparkSession.implicits._
    rows
      .withColumn("ts", col("date").cast("timestamp"))
      .as[PriceEvent]
      .withWatermark("ts", "0 seconds")
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[LastDate, CheckRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (sym: String, it: Iterator[PriceEvent], state: GroupState[LastDate]) =>
          if (state.hasTimedOut) {
            val s = state.get
            val staleDaysNow = state.getCurrentWatermarkMs() / DayMs - s.epochDay
            state.remove()
            Iterator.single(CheckRow(runTs, "silver", "stale_data", sym, "FAIL",
              staleDaysNow.toDouble, staleDays.toDouble,
              s"last date ${java.time.LocalDate.ofEpochDay(s.epochDay)} is " +
                s"$staleDaysNow days old"))
          } else {
            val maxNew = it.map(_.date.toLocalDate.toEpochDay).max
            val last = math.max(maxNew, state.getOption.map(_.epochDay).getOrElse(Long.MinValue))
            state.update(LastDate(last))
            // batch FAIL condition is datediff(today, last) > staleDays,
            // i.e. today >= last + staleDays + 1: set the timeout exactly
            // there. If the horizon already passed (a symbol replaying old
            // history), fire at the next watermark advance instead —
            // setTimeoutTimestamp rejects timestamps behind the watermark.
            val horizon = (last + staleDays + 1) * DayMs
            state.setTimeoutTimestamp(math.max(horizon, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** foreachBatch sink into the batch DQ table (same schema, same
    * `layer` partitioning as QualityChecks.run): streaming and batch
    * checks land in ONE monitoring table. */
  def persistChecks(checks: Dataset[CheckRow], catalog: graft.pipeline.Catalog,
                    table: String, checkpointDir: String): StreamingQuery =
    checks.toDF().writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, _: Long) =>
        catalog.append(b, table, Seq("layer"))
      }
      .start()
}
