package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named queries (cold + warm, noop sink) without running
  * the whole bench. `runMain graft.QueryProbe q120_spearman ...`;
  * SPARK_GRAFT_SF_DIR selects the scale (default sf0.1). Same session
  * config as Bench so numbers are comparable. */
object QueryProbe {
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
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); System.gc()
      val warm = once(); System.gc()
      println(f"PROBE $name cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
