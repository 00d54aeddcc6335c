package graft.pipeline

import graft.GraftSession

/** CLI for the medallion pipeline:
  *
  *   runMain graft.pipeline.Main <csvDir> <warehouseDir> [source]
  *   runMain graft.pipeline.Main --config <config.yaml> <warehouseDir>
  *
  * Runs bronze → silver → gold → DQ, persisting the five tables under
  * `warehouseDir`, and prints the per-layer row counts — the same linear
  * job the reference schedules daily. The --config form is the reference's
  * config.yaml workflow: symbols, date range, source, input path, table
  * names, and DQ thresholds all come from the file.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    try {
      val r =
        if (args.headOption.contains("--config")) {
          require(args.length >= 3, "usage: Main --config <config.yaml> <warehouseDir>")
          PipelineRunner.runConfigured(spark, args(2), PipelineConfig.load(args(1)))
        } else {
          require(args.length >= 2, "usage: Main <csvDir> <warehouseDir> [source]")
          val source = if (args.length > 2) args(2) else "stooq"
          PipelineRunner.run(spark, args(1), args(0), source)
        }
      println(s"bronze=${r.bronzeRows} silver=${r.silverRows} " +
        s"rejected=${r.rejectedRows} gold=${r.goldRows} dq=${r.dqRows}")
    } finally spark.stop()
  }
}
