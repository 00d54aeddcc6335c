package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamingOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CDC apply: tombstone semantics across micro-batch
  * boundaries and batch/stream parity with the q224 contract. */
class StreamingCdcSpec extends SparkTestBase {

  private def run(batches: Seq[Seq[CdcOp]], tws: Boolean = false): Map[Long, CdcRow] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[CdcOp]
    val name = s"cdc_${System.nanoTime()}"
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    val q = try {
      if (tws) spark.conf.set(providerKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      (if (tws) applyChangelogTws(input.toDS()) else applyChangelog(input.toDS()))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
    } finally prevProvider match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // Update mode re-emits a key per batch: keep the LAST emission
      spark.table(name).as[CdcRow].collect()
        .zipWithIndex.groupBy(_._1.user_id)
        .map { case (u, rows) => u -> rows.maxBy(_._2)._1 }
    } finally q.stop()
  }

  test("a tombstone in a LATER batch wipes state built earlier") {
    val got = run(Seq(
      Seq(CdcOp(1, 1, "I", Some(5L), None), CdcOp(1, 2, "U", None, Some(20.0))),
      Seq(CdcOp(1, 3, "D", None, None), CdcOp(1, 4, "I", Some(7L), None))))
    assert(got(1L) == CdcRow(1L, exists = true, Some(7L), None, 1L),
      s"pre-delete amount leaked across batches: ${got(1L)}")
  }

  test("trailing delete leaves exists=false; replayed seqs are idempotent") {
    val got = run(Seq(
      Seq(CdcOp(2, 1, "I", Some(9L), None)),
      Seq(CdcOp(2, 2, "U", None, Some(30.0)), CdcOp(2, 2, "U", None, Some(30.0))),
      Seq(CdcOp(2, 3, "D", None, None))))
    assert(got(2L) == CdcRow(2L, exists = false, None, None, 0L))
  }

  test("a null payload on a later I/U overwrites (batch last-write-wins parity)") {
    // Batch q224 takes the LAST I/U's payload even when it is null
    // (max of struct(event_id, value)) — keeping the prior value on a
    // None payload would silently diverge from that contract.
    val got = run(Seq(
      Seq(CdcOp(4, 1, "I", Some(5L), None), CdcOp(4, 2, "I", None, None)),
      Seq(CdcOp(5, 3, "I", Some(3L), None), CdcOp(5, 4, "U", None, Some(10.0)),
        CdcOp(5, 5, "U", None, None))))
    assert(got(4L) == CdcRow(4L, exists = true, None, None, 2L),
      s"null-plan I must overwrite: ${got(4L)}")
    assert(got(5L) == CdcRow(5L, exists = true, Some(3L), None, 3L),
      s"null-amount U must overwrite: ${got(5L)}")
  }

  test("any micro-batch split of the same ops converges to the batch answer") {
    val ops = Seq(
      CdcOp(1, 1, "I", Some(5L), None), CdcOp(1, 2, "U", None, Some(20.0)),
      CdcOp(1, 3, "D", None, None), CdcOp(1, 4, "I", Some(7L), None),
      CdcOp(2, 5, "I", Some(9L), None), CdcOp(2, 6, "U", None, Some(30.0)),
      CdcOp(3, 7, "I", Some(1L), None), CdcOp(3, 8, "D", None, None))
    val expected = Map(
      1L -> CdcRow(1L, exists = true, Some(7L), None, 1L),
      2L -> CdcRow(2L, exists = true, Some(9L), Some(30.0), 2L),
      3L -> CdcRow(3L, exists = false, None, None, 0L))
    for (splitAt <- Seq(1, 3, 5, 8)) {
      val (a, b) = ops.splitAt(splitAt)
      val batches = if (b.isEmpty) Seq(a) else Seq(a, b)
      assert(run(batches) == expected, s"split at $splitAt diverged")
    }
  }

  test("transformWithState path matches mapGroupsWithState across batch splits") {
    val ops = Seq(
      CdcOp(1, 1, "I", Some(5L), None), CdcOp(1, 2, "U", None, Some(20.0)),
      CdcOp(1, 3, "D", None, None), CdcOp(1, 4, "I", Some(7L), None),
      CdcOp(2, 5, "I", Some(9L), None), CdcOp(2, 6, "U", None, None),
      CdcOp(3, 7, "I", Some(1L), None), CdcOp(3, 8, "D", None, None))
    for (splitAt <- Seq(2, 4, 8)) {
      val (a, b) = ops.splitAt(splitAt)
      val batches = if (b.isEmpty) Seq(a) else Seq(a, b)
      assert(run(batches, tws = true) == run(batches),
        s"TWS diverged from mapGroupsWithState at split $splitAt")
    }
  }
}
