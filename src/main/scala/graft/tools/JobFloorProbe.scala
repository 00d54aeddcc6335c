package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-gate job-count × scheduling-floor decomposition for the iterated
  * graph gates: measures (1) each gate's wall time and Spark JOB count on
  * the Bench session, and (2) this harness's per-round floor — the cost
  * of one state-sized join + aggregate + localCheckpoint round with
  * near-zero data — plus the minimal-job floor (a trivial 8-partition
  * noop write). If wall ≈ jobs × floor, the residual vs an in-process
  * single-memory-space engine is the local[?] job-scheduling constant
  * (which amortizes at cluster scale where each round moves real data),
  * not missing plan work.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JobFloorProbe [gates...]
  */
object JobFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val gates = if (args.nonEmpty) args.toSeq else Seq(
      "q217_coreness", "q250_weighted_sssp", "q261_personalized_pagerank",
      "q268_pseudo_diameter", "q272_stress_centrality", "q305_louvain_phase1")

    @volatile var jobs = 0
    @volatile var stages = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = stages += 1
    })
    def settle(): Unit = Thread.sleep(800) // listener bus is async

    def force(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // ---- floor 1: minimal job (trivial 8-partition noop write) ----
    def minimalJob(): Unit =
      spark.range(1024).repartition(8).write.format("noop").mode("overwrite").save()
    (1 to 5).foreach(_ => minimalJob())
    settle()
    val m0 = System.nanoTime()
    (1 to 30).foreach(_ => minimalJob())
    val minFloor = (System.nanoTime() - m0) / 1e9 / 30

    // ---- floor 2: one state-sized graph ROUND with near-zero data ----
    // (20k-node state joins a 60k-edge checkpointed list, grouped min,
    //  localCheckpoint — the exact per-round shape of the gate loops)
    val edges = spark.range(60000)
      .select((col("id") % 20000).as("src"),
        ((col("id") * 7 + 1) % 20000).as("dst"), lit(1L).as("w"))
      .localCheckpoint(true)
    def round(st: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      graft.graph.Graph.withStateSizedShuffle(spark, 20000L) {
        st.join(edges, st("id") === edges("src"))
          .groupBy($"dst").agg(min($"v").as("v"))
          .select($"dst".as("id"), $"v")
          .localCheckpoint(true)
      }
    var st = spark.range(20000).select($"id", lit(0L).as("v")).localCheckpoint(true)
    (1 to 4).foreach(_ => st = round(st))
    val r0 = System.nanoTime()
    (1 to 20).foreach(_ => st = round(st))
    val roundFloor = (System.nanoTime() - r0) / 1e9 / 20

    println(f"[floor] minimal job     ${minFloor}%7.3f s/job")
    println(f"[floor] state round     ${roundFloor}%7.3f s/round (join+agg+checkpoint)")

    // ---- per-gate decomposition ----
    println(f"[gate]  ${"name"}%-32s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"s/job"}%7s ${"jobsXroundFloor"}%16s")
    gates.foreach { g =>
      force(g) // warm: codegen/JIT/footer one-offs, as Bench does
      System.gc()
      settle()
      jobs = 0; stages = 0
      val t0 = System.nanoTime()
      force(g)
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      val (j, s) = (jobs, stages)
      println(f"[gate]  $g%-32s $wall%8.2f $j%5d $s%7d ${wall / math.max(1, j)}%7.3f ${j * roundFloor}%16.2f")
    }
    spark.stop()
  }
}
