package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators: watermarked windowed aggregation and
  * stateful sessionization.
  *
  * The reference is batch-only (its config reserves a checkpoints dir that
  * nothing consumes — SURVEY §2.10); these are the north-star streaming
  * extensions (§7.6). Shapes chosen for scale:
  *  - windowed aggs carry a watermark so state is bounded and late data has
  *    a defined cutoff;
  *  - sessionization uses flatMapGroupsWithState with processing-time
  *    timeout: per-key state is one open session (constant size), closed
  *    sessions are emitted incrementally — the streaming dual of the batch
  *    lag/gap-flag/running-sum sessionize (q21).
  */
object StreamingOps {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)

  final case class Session(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  /** Per-key state: the one open session (public — encoder codegen needs
    * constructor/accessor visibility). */
  final case class OpenSession(start: Long, end: Long, n: Long)

  /** Streaming curation router: tags each record with its deterministic
    * train/eval split (CurationQueries.splitColumn — a pure function of
    * the id) so a `writeStream.partitionBy("split")` sink lands every
    * document in the same shard batch q60 would assign it to. Stateless:
    * no watermark, no aggregation — pure projection at any input rate. */
  def routeBySplit(docs: DataFrame, idCol: String, evalPct: Int = 10): DataFrame =
    docs.withColumn("split", graft.queries.CurationQueries.splitColumn(idCol, evalPct))

  /** Tumbling-window counts/averages per event type with a watermark:
    * late rows beyond `watermark` are dropped and their state reclaimed. */
  def windowedStats(events: DataFrame, window: String = "1 minute",
                    watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("avg_value"))

  /** Gap-based sessionization: a session closes when `gapSeconds` of event
    * time pass with no event for the key. Emits closed sessions; one open
    * session per key stays in state until the watermark passes its gap
    * horizon (event-time timeout → bounded state, late-data-safe — and the
    * engine only reschedules batches when the watermark actually moves,
    * unlike processing-time timeouts which busy-loop the microbatch
    * scheduler). */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed the gap horizon: flush the open session
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.value))
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  // max, not t: a cross-batch out-of-order event inside
                  // (watermark, end] passes the eviction-watermark late
                  // filter and lands here with t < end — it must absorb
                  // into the session, not SHRINK it (a bare `end = t`
                  // also moved the timeout horizon backward)
                  open = Some(s.copy(end = math.max(s.end, t), n = s.n + 1))
                case Some(s) =>
                  closed += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  open = Some(OpenSession(t, t, 1))
                case None =>
                  open = Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // end+gap is always a LEGAL (post-watermark) timeout here:
              // FlatMapGroupsWithStateExec filters late input against the
              // EVICTION watermark (the current batch's, NOT the lagged
              // late-events value aggregations use — pinned by
              // FmgwsLateFilterSpec), so every event reaching this
              // function has ts > wm, hence end + gap > wm.
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** One CDC op: seq orders ops globally (monotone ingestion id); op is
    * I/U/D; I carries `plan`, U carries `amount`, D carries nothing. */
  final case class CdcOp(user_id: Long, seq: Long, op: String,
      plan: Option[Long], amount: Option[Double])

  /** Per-key CDC state (public for encoder codegen): last applied seq so
    * replayed/out-of-order ops within a batch resolve deterministically,
    * and the live column values since the last tombstone. */
  final case class CdcState(lastSeq: Long, exists: Boolean,
      plan: Option[Long], amount: Option[Double], liveOps: Long)

  /** Materialized row state after each micro-batch (Update emission). */
  final case class CdcRow(user_id: Long, exists: Boolean,
      plan: Option[Long], amount: Option[Double], n_live_ops: Long)

  /** Streaming CDC changelog apply — the incremental dual of the batch
    * q224 gate, same tombstone contract: D wipes (column values from
    * before the delete never leak into a re-inserted row), a trailing D
    * leaves exists=false, partial updates touch only their column. State
    * per key is ONE CdcState (constant size — never the op history), ops
    * within a micro-batch apply in `seq` order, and each batch emits the
    * key's post-batch state (Update mode — the changelog of the
    * materialized view). StreamingCdcSpec pins batch/stream parity:
    * any split of the same op stream into micro-batches converges to
    * q224's batch answer. */
  /** The one CDC fold both stateful APIs share — semantics can't drift
    * between the mapGroupsWithState and transformWithState paths. */
  private def foldCdcBatch(userId: Long, start: CdcState,
      batch: Iterator[CdcOp]): CdcState = {
    var st = start
    batch.toSeq.sortBy(_.seq).foreach { o =>
      if (o.seq > st.lastSeq) {
        st = o.op match {
          case "D" => CdcState(o.seq, exists = false, None, None, 0L)
          // Last-write-wins INCLUDING null payloads — batch q224
          // takes the last I/U's payload even when it is null
          // (max of struct(event_id, value)), so keeping the prior
          // value on a None payload would silently diverge from
          // the documented batch/stream parity.
          case "I" => st.copy(lastSeq = o.seq, exists = true,
            plan = o.plan, liveOps = st.liveOps + 1)
          case "U" => st.copy(lastSeq = o.seq, exists = true,
            amount = o.amount, liveOps = st.liveOps + 1)
          case other => throw new IllegalArgumentException(
            s"unknown CDC op '$other' for user $userId seq ${o.seq}")
        }
      }
    }
    st
  }

  private val cdcZero = CdcState(Long.MinValue, exists = false, None, None, 0L)

  def applyChangelog(ops: Dataset[CdcOp]): Dataset[CdcRow] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.user_id)
      .mapGroupsWithState[CdcState, CdcRow](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[CdcOp], state: GroupState[CdcState]) =>
          val st = foldCdcBatch(userId, state.getOption.getOrElse(cdcZero), batch)
          state.update(st)
          CdcRow(userId, st.exists, st.plan, st.amount, st.liveOps)
      }
  }

  /** The same CDC apply through Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes mapGroupsWithState (typed state
    * variables on the RocksDB store, timers, TTL). One `ValueState`
    * holds the per-key CdcState; the fold is [[foldCdcBatch]] verbatim,
    * so q264's hash gate proves the NEW stateful exec reaches the same
    * fixed point as the old one and the batch oracle. Requires the
    * RocksDB state store provider (the only provider TWS supports). */
  class CdcProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, CdcOp, CdcRow] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[CdcState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[CdcState]("cdc",
        org.apache.spark.sql.Encoders.product[CdcState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[CdcOp],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[CdcRow] = {
      val st = foldCdcBatch(userId,
        Option(state.get()).getOrElse(cdcZero), rows)
      state.update(st)
      Iterator.single(CdcRow(userId, st.exists, st.plan, st.amount, st.liveOps))
    }
  }

  def applyChangelogTws(ops: Dataset[CdcOp]): Dataset[CdcRow] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.user_id)
      .transformWithState(new CdcProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Per-key token-bucket state: available tokens, last event ts (ns),
    * whether any event was seen, and the running admit/total counters. */
  final case class BucketState(avail: Long, prevTs: Long, seen: Boolean,
      n: Long, adm: Long)
  final case class BucketRow(user_id: Long, n_events: Long, n_admitted: Long)

  val bucketZero: BucketState = BucketState(5L, 0L, seen = false, 0L, 0L)

  /** The one token-bucket fold the batch (q284 flatMapSortedGroups) and
    * streaming (q285 transformWithState) paths share — capacity 5, one
    * token per 10 minutes, whole-token refill credit per gap (integer
    * ns div). Caller guarantees ts order; the recurrence's min-cap makes
    * it non-associative, so order IS the contract — and the fold ENFORCES
    * it across the micro-batch boundary: BucketProcessor only sorts within
    * a batch, so an event older than the persisted prevTs would feed a
    * negative gap into the refill and mint negative token credit. Such
    * late data fails loudly here (kill the query, fix the upstream
    * ordering/watermark) instead of silently corrupting bucket state. */
  def foldBucketOrdered(start: BucketState, tss: Iterator[Long]): BucketState = {
    var st = start
    tss.foreach { ts =>
      if (st.seen && ts < st.prevTs)
        throw new IllegalStateException(
          s"token-bucket fold saw ts=$ts < persisted prevTs=${st.prevTs}: " +
            "cross-batch late data violates the ordered-ts contract " +
            "(in-batch sorting cannot reorder against already-folded state); " +
            "drop or re-order late events upstream")
      var avail = st.avail
      if (st.seen) avail = math.min(5L, avail + (ts - st.prevTs) / 600000000000L)
      val admit = avail > 0
      st = BucketState(if (admit) avail - 1 else avail, ts, seen = true,
        st.n + 1, st.adm + (if (admit) 1 else 0))
    }
    st
  }

  /** q285's processor: buffers the micro-batch's rows per key, sorts by
    * (ts, event_id) — arrival order is not time order — and runs the
    * shared fold. Per-key persistent state is ONE BucketState; the
    * in-batch sort is bounded by the key's rows per micro-batch (the
    * single-replay gate feeds one batch; a production deployment feeds
    * many small ones, bounding the buffer the same way q233's does). */
  class BucketProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long, Long), BucketRow] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[BucketState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[BucketState]("bucket",
        org.apache.spark.sql.Encoders.product[BucketState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[(Long, Long, Long)],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[BucketRow] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      val st = foldBucketOrdered(
        Option(state.get()).getOrElse(bucketZero), sorted.iterator.map(_._2))
      state.update(st)
      Iterator.single(BucketRow(userId, st.n, st.adm))
    }
  }

  /** Token-bucket admission over a (user_id, ts_ns, event_id) stream via
    * transformWithState; Update mode emits each key's post-batch
    * counters. */
  def rateLimitTws(ev: Dataset[(Long, Long, Long)]): Dataset[BucketRow] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_._1)
      .transformWithState(new BucketProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
