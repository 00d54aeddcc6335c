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
