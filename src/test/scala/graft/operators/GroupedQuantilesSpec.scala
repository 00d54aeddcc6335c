package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[DistributedScan.groupedQuantiles]] — the round-12 replacement for
  * the buffered exact `percentile` aggregate — must reproduce
  * quantile_cont semantics exactly: h = (n−1)·p, linear interpolation
  * between the bracketing order statistics, nulls skipped. Checked three
  * ways: against a from-scratch sorted-sequence reference, against
  * Spark's own aggregate on the same data (the compatibility the four
  * migrated gates rely on), and on the edge shapes that break naive rank
  * arithmetic (ties, single-element groups, integer h, null values). */
class GroupedQuantilesSpec extends SparkTestBase {
  import spark.implicits._

  private def refQuantile(sorted: Vector[Double], p: Double): Double = {
    val h = (sorted.size - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.min(lo + 1, sorted.size - 1)
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  test("matches the sorted-sequence reference on seeded random groups") {
    val rng = new scala.util.Random(0x5CA1EDL)
    val ps = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    val data = for {
      g <- Seq("a", "b", "c")
      // deliberately tie-rich: values on a coarse lattice
      v <- Seq.fill(200 + rng.nextInt(100))(rng.nextInt(40) / 4.0)
    } yield (g, v)
    val got = DistributedScan.groupedQuantiles(
        data.toDF("g", "v"), $"g", $"v", ps, ps.indices.map(i => s"q$i"))
      .collect()
      .map(r => r.getString(0) ->
        ps.indices.map(i => r.getDouble(i + 1)).toVector)
      .toMap
    val byG = data.groupBy(_._1)
    assert(got.keySet == byG.keySet)
    byG.foreach { case (g, rows) =>
      val sorted = rows.map(_._2).sorted.toVector
      ps.zipWithIndex.foreach { case (p, i) =>
        val want = refQuantile(sorted, p)
        assert(math.abs(got(g)(i) - want) < 1e-9,
          s"group $g p=$p: got ${got(g)(i)}, want $want")
      }
    }
  }

  test("agrees with Spark's exact percentile aggregate (migration contract)") {
    val rng = new scala.util.Random(0xABCD12L)
    val data = (1 to 1500).map(i =>
      (s"g${i % 4}", math.round(rng.nextDouble() * 1e6) / 100.0))
    val df = data.toDF("g", "v")
    val ps = Seq(0.05, 0.5, 0.95)
    val scan = DistributedScan.groupedQuantiles(
        df, $"g", $"v", ps, Seq("a", "b", "c"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val agg = df.groupBy($"g")
      .agg(expr("percentile(v, array(0.05D, 0.5D, 0.95D))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    agg.foreach { case (g, want) =>
      val (a, b, c) = scan(g)
      // the two float forms (weighted-average vs lower+frac*(upper-lower))
      // agree to well inside the 6-dp round every gate applies
      assert(math.abs(a - want(0)) < 1e-6 && math.abs(b - want(1)) < 1e-6 &&
        math.abs(c - want(2)) < 1e-6, s"group $g: scan ($a,$b,$c) vs agg $want")
    }
  }

  test("edges: single-element group, all-ties group, integer h, nulls skipped") {
    val df = Seq(
      ("one", Some(7.5)),                       // single element: every p = 7.5
      ("tie", Some(3.0)), ("tie", Some(3.0)), ("tie", Some(3.0)),
      ("nul", None), ("nul", Some(1.0)), ("nul", Some(2.0)),
      ("int", Some(10.0)), ("int", Some(20.0)), ("int", Some(30.0)),
      ("allnull", None)                          // group vanishes
    ).toDF("g", "v")
    val out = DistributedScan.groupedQuantiles(
        df, $"g", $"v", Seq(0.0, 0.5, 1.0), Seq("p0", "p50", "p100"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("one") == ((7.5, 7.5, 7.5)))
    assert(out("tie") == ((3.0, 3.0, 3.0)))
    assert(out("nul") == ((1.0, 1.5, 2.0)), "nulls must be skipped, n=2")
    // h integer at p=0.5 with n=3 -> exactly the middle value, no blend
    assert(out("int") == ((10.0, 20.0, 30.0)))
    assert(!out.contains("allnull"), "an all-null group has no quantiles")
  }

  test("caller-asserted bound: no decision action at construction, paths agree") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 9.0),
      ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)).toDF("g", "v")
    // the measured default pays a dedicated decision action per
    // invocation (the round-13 q102 driver regression). Construction is
    // never fully job-free — the lazy localCheckpoint's toRdd under AQE
    // materializes the upstream shuffle stages either way — so the
    // pinned contract is RELATIVE: the hinted call must run strictly
    // fewer construction-time jobs than the measured call (it drops the
    // decision count and its post-checkpoint aggregate stages)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    def constructionJobs(build: => org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, Int) = {
      jobs = 0
      spark.sparkContext.addSparkListener(listener)
      try {
        val d = build
        org.apache.spark.graft.BusDrain.drain(spark.sparkContext)
        (d, jobs)
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val (hinted, hJobs) = constructionJobs(DistributedScan.groupedQuantiles(
      df, $"g", $"v", Seq(0.25, 0.5), Seq("q25", "q50"), maxGroups = Some(2)))
    val (measuredDf, mJobs) = constructionJobs(DistributedScan.groupedQuantiles(
      df, $"g", $"v", Seq(0.25, 0.5), Seq("q25", "q50")))
    assert(hJobs < mJobs,
      s"hinted construction ran $hJobs job(s) vs measured $mJobs — the " +
        "asserted bound must remove the dedicated decision action")
    // all three routes — hinted-small, hinted-large (shuffled offsets),
    // measured — produce identical numbers on the same data
    def snap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
    val small = snap(hinted)
    val large = snap(DistributedScan.groupedQuantiles(
      df, $"g", $"v", Seq(0.25, 0.5), Seq("q25", "q50"),
      maxGroups = Some(1000000)))
    val measured = snap(measuredDf)
    assert(small == large && small == measured,
      s"path divergence: small=$small large=$large measured=$measured")
    assertThrows[IllegalArgumentException] {
      DistributedScan.groupedQuantiles(
        df, $"g", $"v", Seq(0.5), Seq("m"), maxGroups = Some(0))
    }
  }

  test("1e5 groups: offsets are distributed, no group-sized single-task window") {
    val n = 100000L
    val df = spark.range(3 * n).select(
      (col("id") % n).as("g"),
      ((col("id") * 2654435761L) % 1000L).cast("double").as("v"))
    val out = DistributedScan.groupedQuantiles(df, col("g"), col("v"),
      Seq(0.5), Seq("m"))
    val got = out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == n, s"one row per group, got ${got.size}")
    // spot-check the median against the three known values per group
    Seq(0L, 1L, 12345L, 99999L).foreach { g =>
      val vs = Seq(g, g + n, g + 2 * n)
        .map(id => ((id * 2654435761L) % 1000L).toDouble).sorted
      assert(got(g) == vs(1), s"group $g: got ${got(g)}, want ${vs(1)}")
    }
    // the scale contract: every unpartitioned window in the executed plan
    // is the |shuffle-partitions|-row offsets frame (ordered by __pid) —
    // nothing orders the |groups|-sized frame through one task. Stage
    // bodies are expanded via PlanGuards (bare collect is AQE-vacuous).
    val windows = graft.pipeline.PlanGuards
      .flatten(out.queryExecution.executedPlan)
      .collect { case w: org.apache.spark.sql.execution.window.WindowExec => w }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.nonEmpty, "expected the tiny __pid offsets windows")
    unpartitioned.foreach { w =>
      assert(w.orderSpec.forall(_.child.toString.contains("__pid")),
        s"group-sized unpartitioned window in plan: ${w.orderSpec.mkString(",")}")
    }
  }
}
