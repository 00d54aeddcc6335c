package graft
import org.apache.spark.sql.SparkSession
/** Dev harness: time named gate queries cold (pass 1) and warm (pass 2)
  * at bench settings without running the whole Bench suite — the loop for
  * targeted plan/perf work on a single slow query. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (pass <- 1 to 2; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"PASS$pass $n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
