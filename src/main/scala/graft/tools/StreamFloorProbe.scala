package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}
import org.apache.spark.sql.streaming.StreamingQueryListener.{
  QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Per-gate decomposition of the streaming gates' fixed costs — the
  * streaming analogue of [[JobFloorProbe]]: the graph loops were shown to
  * be job-count-bound (wall ≈ jobs × scheduling floor); this probe shows
  * where each streaming gate's wall actually goes, split into the
  * components a StreamingQueryProgress reports:
  *
  *   - addBatch        — micro-batch execution (the actual query work)
  *   - wal+offsets     — offset WAL + commit log fsyncs (exactly-once cost)
  *   - planning        — incremental planner per micro-batch
  *   - source          — getBatch/latestOffset (file-listing for the
  *                       FileStreamSource replays)
  *   - state commit    — state-store commit inside addBatch (HDFS-backed
  *                       store: snapshot + maintenance)
  *   - lifecycle       — wall − triggerExecution: query start/stop,
  *                       checkpoint-dir setup, listener/termination
  *                       plumbing, and the batch-side read of the memory
  *                       sink — the per-QUERY fixed cost that a live
  *                       always-on stream pays once, not per statement
  *
  * Also measures the minimal-query floor (a one-file AvailableNow replay
  * into a memory sink, no state) so "lifecycle" has an absolute anchor.
  * Run: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamFloorProbe`;
  * results are recorded in SCALE.md (round 11).
  */
object StreamFloorProbe {

  private final case class Prog(dur: Map[String, Long], stateCommitMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val progress = new ConcurrentLinkedQueue[Prog]()
    val queriesStarted = new AtomicInteger(0)
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = {
        queriesStarted.incrementAndGet(); ()
      }
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        progress.add(Prog(
          p.durationMs.asScala.map { case (k, v) => (k, v.toLong) }.toMap,
          p.stateOperators.map(_.commitTimeMs).sum)); ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })

    // the listener bus is async: give it a beat before draining
    def drain(): (Int, List[Prog]) = {
      Thread.sleep(600)
      val ps = progress.asScala.toList
      progress.clear()
      (queriesStarted.getAndSet(0), ps)
    }

    // ---- minimal-query lifecycle floor: one tiny file, no state ----
    val tiny = java.nio.file.Files.createTempDirectory("graft_sfloor_").toString
    spark.range(8).toDF("v").coalesce(1).write.mode("overwrite").parquet(tiny)
    def minimalRun(): Double = {
      val t0 = System.nanoTime()
      val q = spark.readStream.schema("v LONG").parquet(tiny)
        .writeStream.format("memory").queryName("stream_floor_probe")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    minimalRun(); drain() // warm-up: codegen + first checkpoint-dir setup
    println("== minimal-query floor (stateless 1-file AvailableNow) ==")
    (1 to 3).foreach { i =>
      val wall = minimalRun()
      val (_, ps) = drain()
      val trig = ps.flatMap(_.dur.get("triggerExecution")).sum / 1000.0
      println(f"run $i: wall=$wall%.3f s, batches=${ps.size}, " +
        f"triggerExecution=$trig%.3f s, lifecycle=${wall - trig}%.3f s")
    }

    // ---- the streaming gates ----
    val gates = Seq(
      "q239_stream_stream_join", "q247_stream_windowed_agg",
      "q249_stream_dedup", "q297_stream_session_window",
      "q298_stream_left_outer_join", "q312_stream_static_join",
      "q326_stream_chained_stateful", "q329_stream_dedup_within_wm",
      "q333_stream_chained_aggs", "q336_stream_dedup_then_agg",
      "q337_stream_fmgws_sessionize")
    def force(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    println("\n| gate | wall | queries | batches | addBatch | wal+offsets " +
      "| planning | source | stateCommit | lifecycle |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    gates.foreach { g =>
      force(g); drain() // warm pass, same discipline as Bench
      System.gc()
      val t0 = System.nanoTime()
      force(g)
      val wall = (System.nanoTime() - t0) / 1e9
      val (nq, ps) = drain()
      def ms(k: String) = ps.flatMap(_.dur.get(k)).sum / 1000.0
      val trig = ms("triggerExecution")
      println(f"| $g | $wall%.2f | $nq | ${ps.size} | ${ms("addBatch")}%.2f " +
        f"| ${ms("walCommit") + ms("commitOffsets")}%.2f " +
        f"| ${ms("queryPlanning")}%.2f " +
        f"| ${ms("getBatch") + ms("latestOffset")}%.2f " +
        f"| ${ps.map(_.stateCommitMs).sum / 1000.0}%.2f " +
        f"| ${wall - trig}%.2f |")
    }
    spark.stop()
  }
}
