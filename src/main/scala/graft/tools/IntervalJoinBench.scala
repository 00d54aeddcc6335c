package graft.tools

import graft.GraftSession
import org.apache.spark.sql.graft.IntervalJoinStrategy
import org.apache.spark.sql.functions._

/** Measures the custom broadcast interval join against Spark's
  * BroadcastNestedLoopJoin fallback on the same point-in-range workload.
  * Usage: runMain graft.tools.IntervalJoinBench [nPoints] [nIntervals]
  */
object IntervalJoinBench {
  def main(args: Array[String]): Unit = {
    val nPoints = if (args.nonEmpty) args(0).toInt else 2000000
    val nIntervals = if (args.length > 1) args(1).toInt else 2000
    val spark = GraftSession.get()
    import spark.implicits._

    val points = spark.range(nPoints.toLong)
      .select($"id", (rand(42) * 1000000.0).as("p"))
    val intervals = spark.range(nIntervals.toLong)
      .select($"id".as("iv"),
        (rand(7) * 1000000.0).as("lo0"))
      .select($"iv", $"lo0".as("lo"), ($"lo0" + 50.0).as("hi"))

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi").count()
      println(f"IVBENCH $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    spark.experimental.extraStrategies = Seq(IntervalJoinStrategy(spark))
    run("custom-warmup")
    run("custom")
    spark.experimental.extraStrategies = Nil
    run("bnlj-warmup")
    run("bnlj")
    spark.stop()
  }
}
