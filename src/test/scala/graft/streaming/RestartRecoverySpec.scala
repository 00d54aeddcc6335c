package graft.streaming

import graft.SparkTestBase
import graft.streaming.StreamingOps._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Failure injection for the transformWithState paths (q264 CDC apply,
  * q285 RocksDB token bucket): kill the streaming query mid-stream and
  * restart it from the same checkpoint, then assert the final per-key
  * state still equals the batch fold over the full input. This is the
  * exactly-once contract the clean-pipeline gates cannot see: a restart
  * must restore the last COMMITTED RocksDB state version — replaying an
  * uncommitted batch against already-applied state would overshoot the
  * fold (double-count), a lost state version would undershoot, and both
  * fail the equality below.
  *
  * Mechanics: input arrives as individually-mod-time-stamped parquet
  * files through a real FileStreamSource with maxFilesPerTrigger=1, so
  * the replay has genuine micro-batch boundaries. Phase 1 sees the first
  * two files and is stop()-killed as soon as one data batch has
  * committed; phase 2 adds the third file and restarts AvailableNow from
  * the same checkpoint. The sink is foreachBatch into a driver-side
  * buffer keyed by batchId (the memory sink REJECTS checkpoint recovery;
  * foreachBatch is the recovery-capable test sink) — a batch re-executed
  * after the kill overwrites its own batchId slot, so at-least-once sink
  * replay cannot masquerade as a state bug. Update mode re-emits a key's
  * state each batch it appears in; the final state per key is the
  * highest-batchId emission.
  */
class RestartRecoverySpec extends SparkTestBase {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Writes `df` as a single parquet FILE at srcDir/name with the given
    * modification time (FileStreamSource orders files by mod time). */
  private def writeFile(df: org.apache.spark.sql.DataFrame, srcDir: String,
      name: String, modTime: Long): Unit = {
    val stage = tmpDir(s"stage_$name")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    val dest = new java.io.File(srcDir, name)
    java.nio.file.Files.move(part.toPath, dest.toPath)
    assert(dest.setLastModified(modTime))
  }

  /** Starts `build(src)` → foreachBatch into `sink` (batchId → rows) with
    * the shared checkpoint, under the RocksDB provider. */
  private def start[T](srcDir: String, cp: String,
      sink: scala.collection.mutable.Map[Long, Seq[T]],
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[T],
      mode: OutputMode = OutputMode.Update())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val prev = spark.conf.getOption(providerKey)
    try {
      spark.conf.set(providerKey, rocksdb)
      build(spark.readStream
          .schema(spark.read.parquet(srcDir).schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[T], id: Long) =>
          val rows = df.collect().toSeq
          sink.synchronized { sink(id) = rows }
        }
        .option("checkpointLocation", cp)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
    } finally prev match {
      case Some(v) => spark.conf.set(providerKey, v)
      case None => spark.conf.unset(providerKey)
    }
  }

  /** Kills `q` as soon as at least one data batch has committed. */
  private def killAfterFirstCommit(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    while (!q.recentProgress.exists(_.numInputRows > 0) &&
        q.isActive && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(q.recentProgress.exists(_.numInputRows > 0) || !q.isActive,
      "no data batch committed within 60 s")
    q.stop()
    try q.awaitTermination() catch { case _: Exception => () }
  }

  /** Last emission per key, in ascending batchId order. */
  private def lastPerKey[T](sink: scala.collection.mutable.Map[Long, Seq[T]],
      key: T => Long): Map[Long, T] =
    sink.toSeq.sortBy(_._1).flatMap(_._2)
      .foldLeft(Map.empty[Long, T]) { (m, r) => m.updated(key(r), r) }

  test("q285 path: token bucket survives a mid-stream kill and restart") {
    import spark.implicits._
    val srcDir = tmpDir("bucket_src")
    val cp = tmpDir("bucket_cp")
    val rate = 600000000000L // 1 token / 10 min, ns

    // 4 users × 18 events, ts strictly increasing GLOBALLY so the
    // ordered-ts fold contract holds across file (= micro-batch) splits
    val all = for (i <- 0 until 72) yield
      (i % 4 + 1L, i.toLong * (rate / 3), 1000L + i) // (user, ts, event_id)
    val slices = all.grouped(24).toSeq
    val t0 = System.currentTimeMillis() - 100000
    writeFile(slices(0).toDF("user_id", "ts", "event_id"), srcDir, "f0.parquet", t0)
    writeFile(slices(1).toDF("user_id", "ts", "event_id"), srcDir, "f1.parquet", t0 + 10000)

    def build(df: org.apache.spark.sql.DataFrame) =
      rateLimitTws(df.select($"user_id", $"ts", $"event_id").as[(Long, Long, Long)])

    val sink = scala.collection.mutable.Map.empty[Long, Seq[BucketRow]]
    val q1 = start(srcDir, cp, sink, build)
    killAfterFirstCommit(q1)

    writeFile(slices(2).toDF("user_id", "ts", "event_id"), srcDir, "f2.parquet", t0 + 20000)
    val q2 = start(srcDir, cp, sink, build)
    q2.awaitTermination()

    val got = lastPerKey[BucketRow](sink, _.user_id)
    val want = all.groupBy(_._1).map { case (u, evs) =>
      val st = foldBucketOrdered(bucketZero, evs.sortBy(e => (e._2, e._3)).iterator.map(_._2))
      u -> BucketRow(u, st.n, st.adm)
    }
    assert(got.keySet == want.keySet, s"keys diverged: $got")
    for ((u, w) <- want)
      assert(got(u) == w, s"user $u: restart diverged from batch fold — got ${got(u)}, want $w")
  }

  test("q297 path: session windows survive a mid-stream kill and restart, merges included") {
    import spark.implicits._
    val srcDir = tmpDir("sess_src")
    val cp = tmpDir("sess_cp")
    val base = 1700000000000000L // µs
    val min = 60000000L
    // user 1: ONE session spanning all three files (each event within the
    // 10-min gap of the previous) — the restart must restore the open
    // session state or the merged (start, n) is wrong.
    // user 2: two separate sessions (25-min gap between them).
    // user 3: single event in the killed batch only.
    // Append is the ONLY supported output mode for streaming session
    // windows, so the recovery contract under test is exactly-once FLUSH:
    // a closed session must emit exactly once across the kill — a replayed
    // batch re-emitting it, or a lost state version dropping/splitting it,
    // both fail below. A far-future sentinel (user 99) in the last file
    // pushes the zero-delay watermark past every real session's end so all
    // of them flush; the sentinel's own session stays open and never emits.
    val all = Seq(
      (1L, base), (2L, base), (3L, base + min),
      (1L, base + 5 * min), (2L, base + 3 * min),
      (1L, base + 12 * min), (2L, base + 30 * min),
      (1L, base + 20 * min), (2L, base + 33 * min))
    val sentinel = (99L, base + 200 * min)
    val slices = Seq(all.take(3), all.slice(3, 6), all.drop(6) :+ sentinel)
    val t0 = System.currentTimeMillis() - 100000
    writeFile(slices(0).toDF("user_id", "ts_us"), srcDir, "f0.parquet", t0)
    writeFile(slices(1).toDF("user_id", "ts_us"), srcDir, "f1.parquet", t0 + 10000)

    def build(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", org.apache.spark.sql.functions
          .timestamp_micros($"ts_us").as("ets"))
        .withWatermark("ets", "0 seconds")
        .groupBy($"user_id",
          org.apache.spark.sql.functions.session_window($"ets", "10 minutes").as("sw"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .select($"user_id",
          org.apache.spark.sql.functions.unix_micros($"sw.start").as("start_us"),
          org.apache.spark.sql.functions.unix_micros($"sw.end").as("end_us"),
          $"n")
        .as[(Long, Long, Long, Long)]

    val sink = scala.collection.mutable.Map.empty[Long, Seq[(Long, Long, Long, Long)]]
    val q1 = start(srcDir, cp, sink, build, OutputMode.Append())
    killAfterFirstCommit(q1)

    writeFile(slices(2).toDF("user_id", "ts_us"), srcDir, "f2.parquet", t0 + 20000)
    val q2 = start(srcDir, cp, sink, build, OutputMode.Append())
    q2.awaitTermination()

    // every flushed session exactly once across all committed batches
    // (the batchId-keyed sink collapses a replayed batch into one slot, so
    // a double emission can only come from state corruption)
    val emissions = sink.toSeq.sortBy(_._1).flatMap(_._2)
    val counts = emissions.groupBy(r => (r._1, r._2)).map { case (k, v) => k -> v.length }
    assert(counts.values.forall(_ == 1),
      s"a session emitted more than once across the restart: $counts")
    val got = emissions.map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val gap = 10 * min
    val want = all.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List((ts.head, ts.head, 1L))) {
        case ((s, e, n) :: rest, t) =>
          if (t < e + gap) (s, math.max(e, t), n + 1) :: rest
          else (t, t, 1L) :: (s, e, n) :: rest
        case (Nil, t) => List((t, t, 1L))
      }
      sessions.map { case (s, e, n) => (u, s) -> ((e + gap, n)) }
    }
    assert(got == want,
      s"sessions diverged after restart:\n got=$got\nwant=$want")
    // the cross-file merged session really merged: user 1 has ONE session of 4
    assert(got.count(_._1._1 == 1L) == 1 && got((1L, base))._2 == 4L)
  }

  test("q264 path: CDC apply survives a mid-stream kill and restart") {
    import spark.implicits._
    val srcDir = tmpDir("cdc_src")
    val cp = tmpDir("cdc_cp")

    // I/U/D histories whose final state depends on cross-file order:
    // user 1 re-inserted after a tombstone, user 2 plain I+U+U, user 3
    // ends on a tombstone, user 4 null-payload overwrite
    val all = Seq(
      CdcOp(1, 1, "I", Some(5L), None), CdcOp(2, 2, "I", Some(9L), None),
      CdcOp(1, 3, "U", None, Some(20.0)), CdcOp(3, 4, "I", Some(1L), None),
      CdcOp(4, 5, "I", Some(8L), None), CdcOp(2, 6, "U", None, Some(30.0)),
      CdcOp(1, 7, "D", None, None), CdcOp(3, 8, "U", None, Some(40.0)),
      CdcOp(2, 9, "U", None, Some(35.0)), CdcOp(4, 10, "U", None, Some(50.0)),
      CdcOp(1, 11, "I", Some(7L), None), CdcOp(3, 12, "D", None, None),
      CdcOp(4, 13, "U", None, None), CdcOp(1, 14, "U", None, Some(25.0)))
    val slices = all.grouped(5).toSeq // 5 + 5 + 4 ops
    val t0 = System.currentTimeMillis() - 100000
    for ((sl, i) <- slices.zipWithIndex.take(2))
      writeFile(sl.toDF(), srcDir, s"f$i.parquet", t0 + i * 10000)

    def build(df: org.apache.spark.sql.DataFrame) =
      applyChangelogTws(df.as[CdcOp])

    val sink = scala.collection.mutable.Map.empty[Long, Seq[CdcRow]]
    val q1 = start(srcDir, cp, sink, build)
    killAfterFirstCommit(q1)

    writeFile(slices(2).toDF(), srcDir, "f2.parquet", t0 + 20000)
    val q2 = start(srcDir, cp, sink, build)
    q2.awaitTermination()

    val got = lastPerKey[CdcRow](sink, _.user_id)
    val want = Map(
      1L -> CdcRow(1L, exists = true, Some(7L), Some(25.0), 2L),
      2L -> CdcRow(2L, exists = true, Some(9L), Some(35.0), 3L),
      3L -> CdcRow(3L, exists = false, None, None, 0L),
      4L -> CdcRow(4L, exists = true, Some(8L), None, 3L))
    assert(got.keySet == want.keySet, s"keys diverged: $got")
    for ((u, w) <- want)
      assert(got(u) == w, s"user $u: restart diverged — got ${got(u)}, want $w")
  }

  test("sessionize path: flatMapGroupsWithState sessions survive a mid-stream kill and restart") {
    import spark.implicits._
    val srcDir = tmpDir("fmgws_src")
    val cp = tmpDir("fmgws_cp")
    val base = 1700000000000L // ms
    val min = 60000L

    // user 1's second session SPANS the kill point (opens in f1, extends
    // in f2): the restart must restore the OpenSession state or the
    // merged (start, end, n) is wrong. A sentinel in f2 advances the
    // watermark far enough that every real session flushes via the
    // event-time timeout; the sentinel itself stays open (withheld).
    val f0 = Seq((1L, base), (1L, base + 5 * min), (2L, base))
    val f1 = Seq((1L, base + 30 * min))
    val f2 = Seq((1L, base + 35 * min), (99L, base + 600 * min))
    def df(rows: Seq[(Long, Long)]) = rows
      .map { case (u, ms) => (u, new java.sql.Timestamp(ms), "e", 0.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val t0 = System.currentTimeMillis() - 100000
    writeFile(df(f0), srcDir, "f0.parquet", t0)
    writeFile(df(f1), srcDir, "f1.parquet", t0 + 10000)

    def build(d: org.apache.spark.sql.DataFrame) =
      sessionize(d.as[Event], gapSeconds = 600)

    val sink = scala.collection.mutable.Map.empty[Long, Seq[Session]]
    val q1 = start(srcDir, cp, sink, build, OutputMode.Append())
    killAfterFirstCommit(q1)

    writeFile(df(f2), srcDir, "f2.parquet", t0 + 20000)
    val q2 = start(srcDir, cp, sink, build, OutputMode.Append())
    q2.awaitTermination()

    val got = sink.toSeq.sortBy(_._1).flatMap(_._2)
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events)).toSet
    val want = Set(
      (1L, base, base + 5 * min, 2L),            // closed by the f1 gap
      (1L, base + 30 * min, base + 35 * min, 2L), // spans the kill; timeout
      (2L, base, base, 1L))                       // timeout
    assert(got == want, s"restart diverged: got $got want $want")
  }
}
