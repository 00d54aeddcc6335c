package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** [[StreamHarness]] — the one lifecycle contract all AvailableNow gates
  * run through. Two things are pinned: the conf scoping restores the
  * session exactly (width, extra confs, the no-data-batch toggle), and
  * the `noDataBatches = false` classification is RESULT-NEUTRAL for the
  * operator classes that opt out (eager emitters) while the
  * flush-on-watermark class demonstrably NEEDS the trailing batch — the
  * in-spec proof that the per-gate flags encode semantics, not hope. */
class StreamHarnessSpec extends SparkTestBase {
  import spark.implicits._

  private def stageEvents(): String = {
    val dir = tmpDir("graft-harness")
    (1 to 500).map { i =>
      (i.toLong % 50, java.sql.Timestamp.valueOf(
        f"2026-01-01 ${i % 24}%02d:${i % 60}%02d:00"), i.toLong)
    }.toDF("k", "ets", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/ev.parquet")
    dir
  }

  private def src(dir: String) = {
    val schema = spark.read.parquet(s"$dir/ev.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/[e]v.parquet")
  }

  test("conf scoping restores the session exactly, including unset keys") {
    val dir = stageEvents()
    // a defaulted key (getOption surfaces the DEFAULT — "unset" is not
    // observable for it, so the contract is value restoration)
    val provider = "spark.sql.streaming.stateStore.providerClass"
    val providerBefore = spark.conf.get(provider)
    // a genuinely unset custom key must come back unset, not set-to-null
    val custom = "graft.test.harness.scoped"
    assert(spark.conf.getOption(custom).isEmpty, "precondition: custom key unset")
    val widthBefore = spark.conf.get("spark.sql.shuffle.partitions")
    StreamHarness.runToTable(
      src(dir).select($"k", $"v").dropDuplicates("k"),
      "harness_spec_a_", OutputMode.Append(), parts = 3,
      extraConfs = Map(
        provider ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        custom -> "scoped"))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == widthBefore)
    assert(spark.conf.get(provider) == providerBefore,
      "a defaulted extra conf must restore its prior value")
    assert(spark.conf.getOption(custom).isEmpty,
      "an extra conf that was unset before must be unset after")
  }

  test("production confs: width override wins, durable checkpoint root survives the run") {
    val dir = stageEvents()
    val ckHome = tmpDir("graft-harness-durable")
    try {
      spark.conf.set(StreamHarness.widthConf, "5")
      spark.conf.set(StreamHarness.ckRootConf, ckHome)
      val got = StreamHarness.runToTable(
        src(dir).groupBy($"k").agg(sum($"v").as("sv")),
        "harness_spec_w_", OutputMode.Update(), parts = 2)
      assert(got.count() == 50)
      // the checkpoint landed under the configured root and was RETAINED
      // (it is the exactly-once contract there, not gate scratch) — and
      // its state layout proves the configured width overrode parts = 2
      val cks = new java.io.File(ckHome).listFiles()
        .filter(_.getName.startsWith("graft_ckpt_harness_spec_w_"))
      assert(cks.length == 1, "durable checkpoint dir must survive the run")
      val stateParts = new java.io.File(cks.head, "state/0").listFiles()
        .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
      assert(stateParts.length == 5,
        s"state store dirs ${stateParts.length} — configured width must win over parts")
    } finally {
      spark.conf.unset(StreamHarness.widthConf)
      spark.conf.unset(StreamHarness.ckRootConf)
    }
    // and with the confs unset the tmpfs default still cleans up (the
    // original gate posture): nothing to assert beyond a green run
    val got2 = StreamHarness.runToTable(
      src(dir).groupBy($"k").agg(sum($"v").as("sv")),
      "harness_spec_w2_", OutputMode.Update(), parts = 2)
    assert(got2.count() == 50)
  }

  test("eager emitters: dedup result is identical with and without the no-data batch") {
    val dir = stageEvents()
    def run(noData: Boolean) = StreamHarness.runToTable(
        src(dir).select($"k", $"v" % 7).dropDuplicates("k"),
        "harness_spec_d_", OutputMode.Append(), noDataBatches = noData)
      .orderBy($"k").collect().toSeq
    assert(run(noData = true) == run(noData = false))
  }

  test("eager emitters: Update-mode agg is identical with and without the no-data batch") {
    val dir = stageEvents()
    def run(noData: Boolean) = StreamHarness.runToTable(
        src(dir).withWatermark("ets", "1 minute")
          .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("sv")),
        "harness_spec_u_", OutputMode.Update(), noDataBatches = noData)
      .orderBy($"k").collect().toSeq
    assert(run(noData = true) == run(noData = false))
  }

  test("flush-on-watermark: an Append-mode agg NEEDS the trailing batch") {
    val dir = stageEvents()
    def run(noData: Boolean) = StreamHarness.runToTable(
        src(dir).withWatermark("ets", "0 seconds")
          .groupBy(window($"ets", "1 hour")).agg(count(lit(1)).as("n")),
        "harness_spec_f_", OutputMode.Append(), noDataBatches = noData)
      .count()
    val withTrailing = run(noData = true)
    val withoutTrailing = run(noData = false)
    assert(withTrailing > withoutTrailing,
      s"the trailing batch flushes windows ($withTrailing vs $withoutTrailing) — " +
        "an Append-mode agg gate must NOT opt out")
  }
}
