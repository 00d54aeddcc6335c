package graft.pipeline

import graft.GraftSession

/** CLI for the medallion pipeline:
  *
  *   runMain graft.pipeline.Main <csvDir> <warehouseDir> [source]
  *
  * Runs bronze → silver → gold → DQ over the CSVs in `csvDir`, persisting
  * the five tables under `warehouseDir`, and prints the per-layer row
  * counts — the same linear job the reference schedules daily.
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Main <csvDir> <warehouseDir> [source]")
    val Array(csvDir, warehouseDir) = args.take(2)
    val source = if (args.length > 2) args(2) else "stooq"
    val spark = GraftSession.get()
    try {
      val r = PipelineRunner.run(spark, warehouseDir, csvDir, source)
      println(s"bronze=${r.bronzeRows} silver=${r.silverRows} " +
        s"rejected=${r.rejectedRows} gold=${r.goldRows} dq=${r.dqRows}")
    } finally spark.stop()
  }
}
