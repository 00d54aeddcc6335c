package graft.streaming

import java.sql.{Date, Timestamp}
import graft.SparkTestBase
import graft.pipeline.{Catalog, QualityChecks, Schemas, TableNames}
import graft.streaming.StreamingDq.PriceRow
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Batch/stream parity for the DQ checks: replaying a silver batch
  * through the stateful streaming checks must emit exactly the FAIL rows
  * the batch checks persist (same schema, same values), proving the two
  * execution modes monitor with one semantics. */
class StreamingDqSpec extends SparkTestBase {

  private val runTs = Timestamp.valueOf("2026-02-01 00:00:00")
  private val today = Date.valueOf("2026-02-01")

  // AAA: 6-day gap (FAIL at 2026-01-26); BBB: contiguous (no gap);
  // CCC: went quiet on 2026-01-10 -> 22 days stale at `today` (FAIL);
  // ZZZ: the current-date probe that carries the watermark to "today".
  private val rows = Seq(
    PriceRow("AAA", Date.valueOf("2026-01-19")),
    PriceRow("AAA", Date.valueOf("2026-01-20")),
    PriceRow("AAA", Date.valueOf("2026-01-26")),
    PriceRow("AAA", Date.valueOf("2026-01-27")),
    PriceRow("BBB", Date.valueOf("2026-01-26")),
    PriceRow("BBB", Date.valueOf("2026-01-27")),
    PriceRow("BBB", Date.valueOf("2026-01-28")),
    PriceRow("CCC", Date.valueOf("2026-01-09")),
    PriceRow("CCC", Date.valueOf("2026-01-10")),
    PriceRow("ZZZ", Date.valueOf("2026-02-01")))

  private def batchDf = {
    import spark.implicits._
    rows.toDF("symbol", "date")
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(r => (r.getString(3), r.getString(7)))

  test("streaming gap check replays a batch to identical FAIL rows") {
    import spark.implicits._
    val expected = sortedRows(QualityChecks.gapCheck(batchDf, runTs))
    assert(expected.nonEmpty) // AAA's 6-day gap

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PriceRow]
    val q = StreamingDq.gapCheckStream(input.toDS(), runTs)
      .toDF().writeStream.format("memory").queryName("gap_out")
      .outputMode("append").start()
    try {
      // replay in date order, split across micro-batches mid-symbol so the
      // cross-batch state (not intra-batch sorting) carries the check
      val ordered = rows.sortBy(_.date.toLocalDate.toEpochDay)
      val (c1, c2) = ordered.splitAt(ordered.length / 2)
      input.addData(c1); q.processAllAvailable()
      input.addData(c2); q.processAllAvailable()
    } finally q.stop()

    assert(sortedRows(spark.table("gap_out")) == expected)
  }

  test("streaming stale check fires timeouts matching the batch check") {
    import spark.implicits._
    val expected = sortedRows(QualityChecks.staleCheck(batchDf, runTs, today))
    assert(expected.nonEmpty) // CCC went quiet

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PriceRow]
    val q = StreamingDq.staleCheckStream(input.toDS(), runTs)
      .toDF().writeStream.format("memory").queryName("stale_out")
      .outputMode("append").start()
    try {
      // the probe rides in the FIRST batch so the watermark lands on
      // `today` before any timeout is due — timeouts then fire with the
      // stream's clock at exactly the batch check's `today`, making the
      // metric values identical. (Feeding history alone first would leave
      // the watermark at the last history date when CCC's timeout fires.)
      input.addData(rows); q.processAllAvailable()
      input.addData(PriceRow("ZZZ", Date.valueOf("2026-02-01"))); q.processAllAvailable()
    } finally q.stop()

    assert(sortedRows(spark.table("stale_out")) == expected)
  }

  test("persistChecks lands streaming FAIL rows in the batch DQ table") {
    import spark.implicits._
    val wh = tmpDir("graft-stream-dq")
    val catalog = new Catalog(spark, wh)
    val names = TableNames()

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[PriceRow]
    val q = StreamingDq.persistChecks(
      StreamingDq.gapCheckStream(input.toDS(), runTs),
      catalog, names.dq, tmpDir("graft-stream-dq-ckpt"))
    try {
      input.addData(rows); q.processAllAvailable()
    } finally q.stop()

    val persisted = catalog.read(names.dq)
    assert(persisted.schema == Schemas.dataQualityChecks)
    assert(sortedRows(persisted) == sortedRows(QualityChecks.gapCheck(batchDf, runTs)))
  }
}
