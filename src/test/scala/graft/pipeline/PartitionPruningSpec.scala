package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Physical-layout claims verified on the plan: partition pruning reads
  * only matching partition directories, and observe() metrics surface
  * pipeline counts without a second pass. */
class PartitionPruningSpec extends SparkTestBase {

  test("partition filter prunes the scan to matching directories") {
    import spark.implicits._
    val wh = tmpDir("prune")
    (1 to 1000).map(i => (s"S${i % 10}", i.toLong, i * 1.5)).toDF("symbol", "id", "v")
      .write.partitionBy("symbol").parquet(s"$wh/t")

    val q = spark.read.parquet(s"$wh/t").filter($"symbol" === "S3")
    q.collect()

    // stage-aware traversal (PlanGuards): the hand-rolled AQE unwrap this
    // replaced missed scans nested inside query stages
    val scan = PlanGuards.flatten(q.queryExecution.executedPlan)
      .collectFirst { case s: FileSourceScanExec => s }.orNull
    assert(scan != null)
    // 10 symbol directories exist; the scan must select exactly 1
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 pruned partition, got ${scan.selectedPartitions.partitionCount}")
    assert(scan.metadata("PartitionFilters").contains("S3") ||
      scan.partitionFilters.nonEmpty)
  }

  test("observe() surfaces row metrics without an extra job") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .observe("pipe_metrics", count(lit(1)).as("n"), sum($"v").as("sv"))
    val out = df.filter($"id" > 10)
    out.collect()
    val metrics = out.queryExecution.observedMetrics("pipe_metrics")
    // observe sits BEFORE the filter: it sees the full input
    assert(metrics.getAs[Long]("n") == 100L)
    assert(metrics.getAs[Double]("sv") == (1 to 100).map(_ * 2.0).sum)
  }
}
