package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric","value","unit","queries","sf"}.
  *
  * Each query is forced through a "noop" write, not count(): count() lets
  * Catalyst prune the final projections (a scalar-function query would
  * benchmark as a row count), while the noop sink evaluates every output
  * column and discards it. A warmup action first pays the one-off session
  * costs (codegen compiler, parquet footer cache, JIT) so per-query numbers
  * measure the queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup: cheapest query twice — session-level one-off costs land here
    try { force("q16_distinct"); force("q16_distinct") } catch { case _: Throwable => () }

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = names.flatMap { name =>
      val t0 = System.nanoTime()
      try force(name) catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // GC BETWEEN queries (outside the timed section): the ContextCleaner
      // only reclaims finished queries' broadcasts/shuffles after a GC, and
      // without one later queries measure the whole run's memory pressure.
      System.gc()
      // a crashed query has no meaningful duration: failure is reported in
      // "errors" (and the exit code), never encoded into the timing map
      if (errors.contains(name)) None else Some(name -> dt)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors
        .map { case (k, v) => s"${JsonEscape(k)}:${JsonEscape(v)}" }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
